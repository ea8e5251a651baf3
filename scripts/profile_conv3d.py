#!/usr/bin/env python
"""Headline train step: XLA conv3d vs temporal-tap lowering, interleaved.

profile_backward.py isolated the conv3d GRAD-WEIGHT pathology on a bare
conv stack; this measures what actually matters — the FULL jitted headline
train step (forward+backward+Adam, configs/basic/example.yaml operating
point) under both lowerings, traced in one process and timed interleaved
(shared-pool discipline: variants in ONE process, min over repeats).

DL_SWIN_GAN_CONV3D is read at trace time, so each variant is traced+compiled
under its own env value; numerical equivalence of the per-variant loss is
asserted before timing.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_conv3d.py
  env: PROBE_BATCHES="1,8" (remat auto-on for B>1), PROFILE_DTYPE=bfloat16,
       PROBE_DTYPES="float32,bfloat16" (interleaves dtypes in the SAME
       process/timing rounds — the round-3 bf16 A/B was contaminated by
       separate sessions; this is the clean version),
       BENCH_ITERS/BENCH_REPEATS, BENCH_SHAPE="T,Y,X,C"
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_step(cfg_dtype, remat, B, T, Y, X, C, E):
    import jax

    from dl_swin_gan_tpu.utils.headline import headline_cfg, headline_shape
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.models import build_denoiser
    from dl_swin_gan_tpu.solvers import build_solver
    from dl_swin_gan_tpu.train import packing
    from dl_swin_gan_tpu.train.losses import compute_metrics, select_loss
    from dl_swin_gan_tpu.train.train_state import make_optimizer

    cfg = headline_cfg(output_dir="/tmp/profile")
    cfg.MODEL.PARAMETERS.CONV_BLOCK.DTYPE = cfg_dtype
    cfg.MODEL.PARAMETERS.GRAD_CHECKPOINT = remat
    cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA = False

    pre = CinePreprocess(cfg, use_seed=True)
    exs = []
    for b in range(B):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=b)
        exs.append(pre(k, m, t, f"prof_{b}"))
    batch = packing.pack({key: np.stack([e[key] for e in exs])
                          for key in exs[0]})
    batch = jax.tree.map(jax.device_put, batch)

    model = build_solver(cfg, lambda: build_denoiser(cfg))
    tx = make_optimizer(cfg)

    def _init(packed):
        b = packing.unpack(packed)
        params = model.init(jax.random.PRNGKey(0), b["kspace"], b["maps"],
                            b["mask"], x0=b["init_image"])["params"]
        return params, tx.init(params)

    params, opt_state = jax.jit(_init)(batch)

    def loss_fn(p, b):
        pred = model.apply({"params": p}, b["kspace"], b["maps"], b["mask"],
                           x0=b["init_image"])
        return select_loss(compute_metrics(pred, b["target"], tag="T"),
                           "complex_l1", "T")

    def full(params, opt_state, packed):
        b = packing.unpack(packed)
        loss, grads = jax.value_and_grad(loss_fn)(params, b)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return full, (params, opt_state, batch)


def main():
    import jax

    from dl_swin_gan_tpu.utils.headline import headline_shape

    T, Y, X, C, E = headline_shape()
    dtypes = os.environ.get(
        "PROBE_DTYPES", os.environ.get("PROFILE_DTYPE", "float32")).split(",")
    batches = [int(v) for v in
               os.environ.get("PROBE_BATCHES", "1,8").split(",")]
    modes = os.environ.get("PROBE_MODES", "xla,tap").split(",")
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))

    def sync(t):
        np.asarray(jax.tree.leaves(t)[0]).ravel()

    for B in batches:
        remat = B > 1
        # one variant per (dtype, mode); all traced/compiled up front, then
        # timed interleaved across the SAME repeat rounds (hazard-2
        # discipline: one process, min over repeats)
        compiled, loss0, varargs = {}, {}, {}
        for dtype in dtypes:
            step_py, args = build_step(dtype, remat, B, T, Y, X, C, E)
            for mode in modes:
                os.environ["DL_SWIN_GAN_CONV3D"] = mode
                fn = jax.jit(lambda p, o, b, _f=step_py: _f(p, o, b))
                try:
                    p2, o2, loss = fn(*args)
                    sync(p2)
                except Exception as e:  # OOM is a RESULT, not a crash:
                    # tap materializes the temporal taps as a batch axis;
                    # at large B that can exceed HBM (observed: B=16 needs
                    # 29.3G of 15.75G). Record and keep probing.
                    msg = str(e).splitlines()[0][:160]
                    print(f"B={B} dtype={dtype} mode={mode}: "
                          f"COMPILE FAILED ({msg})")
                    continue
                key = (dtype, mode)
                compiled[key], loss0[key], varargs[key] = fn, float(loss), args
        os.environ.pop("DL_SWIN_GAN_CONV3D", None)
        base_mode = modes[0]
        if not compiled:
            print(f"B={B}: no variant compiled; skipping")
            continue
        print(f"B={B} loss " + " ".join(
            f"{d}/{m}={loss0[(d, m)]:.6f}" for d, m in compiled))
        # lowering equivalence is asserted within each dtype (bf16 vs f32
        # losses legitimately differ)
        for dtype in dtypes:
            tol = 1e-4 if dtype == "float32" else 5e-3
            for m in modes[1:]:
                if (dtype, m) not in loss0 or (dtype, base_mode) not in loss0:
                    continue
                rel = (abs(loss0[(dtype, base_mode)] - loss0[(dtype, m)])
                       / max(abs(loss0[(dtype, base_mode)]), 1e-12))
                assert rel < tol, \
                    f"{dtype}/{m} lowering diverges from {base_mode}: {rel}"

        best = {k: float("inf") for k in compiled}
        for _ in range(repeats):
            for key, fn in compiled.items():
                t0 = time.perf_counter()
                out = None
                for _ in range(iters):
                    out = fn(*varargs[key])
                sync(out[0])
                best[key] = min(best[key],
                                (time.perf_counter() - t0) / iters)
        for dtype in dtypes:
            avail = [m for m in modes if (dtype, m) in best]
            if not avail:
                continue
            base = best[(dtype, avail[0])]
            cols = " | ".join(
                f"{m} {best[(dtype, m)]*1e3:8.2f} ms/it "
                f"({B/best[(dtype, m)]:.2f} samples/s, "
                f"{base/best[(dtype, m)]:.2f}x vs {avail[0]})"
                for m in avail)
            print(f"B={B} dtype={dtype} remat={remat}: {cols}")
        champ = min(best, key=best.get)
        ref = best.get((dtypes[0], base_mode), best[champ])
        print(f"B={B} best variant: {champ[0]}/{champ[1]} "
              f"{best[champ]*1e3:.2f} ms/it ({ref/best[champ]:.2f}x vs "
              f"{dtypes[0]}/{base_mode})")


if __name__ == "__main__":
    main()
