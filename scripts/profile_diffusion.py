#!/usr/bin/env python
"""Diffusion train-step breakdown + levers (round-4 verdict #2).

The diffusion workloads sit at 5.8% (DiT) / 7.8% (Latte) MFU. This script
attributes the step time and measures the available levers on the REAL
DiffusionTrainer step, in ONE process (shared-pool discipline):

  breakdown (per build, shared state -> no extra HBM):
    step      full train step (fwd + bwd + Adam + EMA)
    lossfwd   the loss forward alone (q_sample + N-unroll denoiser + k-space
              loss) — step - lossfwd ~= backward + optimizer
    denoiser  one solver forward (N unrolls x [DiT/Latte + hard DC])
    nodc      same solver forward with the hard-DC rule disabled (the DDPM
              meta-arch shares the param tree) — denoiser - nodc = DC cost

  levers (each its own build; ONE build resident at a time — two full DiT
  trainers do not fit the pool's HBM, measured RESOURCE_EXHAUSTED):
    bf16      CONV_BLOCK.DTYPE=bfloat16 transformer trunk
    B=2/B=4   batch scaling (B=1 serializes the chip behind per-layer
              latency, exactly like the conv bs=1 point)
    B=4+remat GRAD_CHECKPOINT per unroll at batch

  control: the f32 B=1 full step is re-measured at the END; the drift
  bounds how much pool contention moved during the probe.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_diffusion.py
  env: PROFILE_MODEL=dit|latte, BENCH_ITERS/BENCH_REPEATS,
       BENCH_SHAPE="T,Y,X,C", PROBE_BATCHES="2,4", PROBE_SKIP_REMAT=1
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(kind, B, T, Y, X, C, E, dtype="float32", remat=False):
    import jax

    from dl_swin_gan_tpu.config import load_cfg
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.parallel.mesh import shard_batch
    from dl_swin_gan_tpu.train import packing
    from dl_swin_gan_tpu.train.diffusion_trainer import DiffusionTrainer

    yaml = {"dit": "configs/config_dit.yaml",
            "latte": "configs/config_latte.yaml"}[kind]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_cfg(os.path.join(root, yaml), freeze=False)
    cfg.MODEL.STRATEGY = "none"
    cfg.MODEL.PARAMETERS.CONV_BLOCK.DTYPE = dtype
    cfg.MODEL.PARAMETERS.GRAD_CHECKPOINT = remat
    cfg.OUTPUT_DIR = "/tmp/profile"
    cfg.freeze()

    pre = CinePreprocess(cfg, use_seed=True)
    exs = []
    for b in range(B):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=b)
        exs.append(pre(k, m, t, f"prof_{b}"))
    batch = {key: np.stack([e[key] for e in exs]) for key in exs[0]}

    trainer = DiffusionTrainer(cfg)
    batch = trainer.prepare_batch(batch)
    state = trainer.init_state(batch)
    trainer._build_steps()
    packed = jax.tree.map(jax.device_put,
                          shard_batch(packing.pack(batch), trainer.mesh))
    return trainer, state, packed, cfg


def _sync(t):
    import jax
    np.asarray(jax.tree.leaves(t)[0]).ravel()


def _time(fn, iters, repeats, chain=None):
    """min over repeats of iters calls; chain=('state',) threads the donated
    state through."""
    best = float("inf")
    carry = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(carry)
            carry = out[0] if isinstance(out, tuple) else carry
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def measure_suite(kind, trainer, state, packed, label, iters, repeats,
                  breakdown=True):
    """Times step / lossfwd / denoiser / nodc on one build."""
    import jax
    import jax.numpy as jnp

    from dl_swin_gan_tpu.train import packing

    out = {}

    st = [state]

    def step(_):
        st[0], metrics = trainer._train_step(st[0], packed)
        return (st[0], metrics)

    st[0], m = trainer._train_step(st[0], packed)  # compile
    _sync(m)
    out["step"] = _time(step, iters, repeats)
    print(f"[{label}] step      {out['step']*1e3:9.2f} ms", flush=True)

    if breakdown:
        key = jax.random.PRNGKey(0)
        loss = trainer._val_loss_step(st[0].params, packed, key)  # compile
        _sync(loss)
        out["lossfwd"] = _time(
            lambda _: trainer._val_loss_step(st[0].params, packed, key),
            iters, repeats)
        print(f"[{label}] lossfwd   {out['lossfwd']*1e3:9.2f} ms", flush=True)

        # one solver forward (unrolls x [denoiser + hard DC]) on the real
        # batch image; and the same WITHOUT the DC rule (DDPM meta-arch
        # shares the param tree - solvers/diffusion_unrolled.py)
        from dl_swin_gan_tpu.solvers.diffusion_unrolled import build_diffusion_solver
        from dl_swin_gan_tpu.train.diffusion_trainer import (
            make_diffusion_denoiser_factory)

        def fwd_fn(meta):
            cfg2 = trainer.cfg.clone()
            cfg2.defrost()
            cfg2.MODEL.META_ARCHITECTURE = meta
            cfg2.freeze()
            solver = build_diffusion_solver(
                cfg2, make_diffusion_denoiser_factory(cfg2,
                                                      deterministic=True))

            def fn(params, packed_batch):
                b = packing.unpack(packed_batch)
                kwargs = trainer._kwargs_from_batch(b, b["mask_p"])
                t = jnp.zeros((b["target"].shape[0],), jnp.int32) + 10
                y = solver.apply({"params": params}, b["init_image"], t,
                                 **kwargs)
                return jnp.sum(jnp.abs(y) ** 2)
            return jax.jit(fn)

        try:
            for name, meta in (("denoiser", trainer.cfg.MODEL.META_ARCHITECTURE),
                               ("nodc", "DDPM_E")):
                f = fwd_fn(meta)
                v = f(st[0].params, packed)
                _sync(v)
                out[name] = _time(lambda _, f=f: f(st[0].params, packed),
                                  iters, repeats)
                print(f"[{label}] {name:9s} {out[name]*1e3:9.2f} ms",
                      flush=True)
        except Exception as e:
            print(f"[{label}] forward split unavailable: "
                  f"{type(e).__name__}: {e}", flush=True)

    return out


def main():
    kind = os.environ.get("PROFILE_MODEL", "dit")
    T, Y, X, C, E = 20, 180, 64, 8, 2
    if os.environ.get("BENCH_SHAPE"):
        T, Y, X, C = (int(v) for v in os.environ["BENCH_SHAPE"].split(","))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    repeats = int(os.environ.get("BENCH_REPEATS", "4"))
    batches = [int(v) for v in
               os.environ.get("PROBE_BATCHES", "2,4").split(",") if v]

    results = {}

    def run(tag, **kw):
        trainer, state, packed, cfg = build(kind, T=T, Y=Y, X=X, C=C, E=E,
                                            **kw)
        res = measure_suite(kind, trainer, state, packed, tag, iters,
                            repeats, breakdown=kw.get("B", 1) == 1
                            and kw.get("dtype", "float32") == "float32"
                            and not kw.get("remat"))
        results[tag] = (res, kw.get("B", 1))
        del trainer, state, packed
        gc.collect()
        return res

    # S1: f32 B=1 with full breakdown
    run("f32/B1", B=1)
    # S2: bf16 trunk
    run("bf16/B1", B=1, dtype="bfloat16")
    # S3: batch scaling (f32; bf16 batched point too if batches fit)
    for b in batches:
        try:
            run(f"f32/B{b}", B=b)
        except Exception as e:
            print(f"[f32/B{b}] failed: {type(e).__name__}: {e}", flush=True)
        try:
            run(f"bf16/B{b}", B=b, dtype="bfloat16")
        except Exception as e:
            print(f"[bf16/B{b}] failed: {type(e).__name__}: {e}", flush=True)
    if not os.environ.get("PROBE_SKIP_REMAT") and batches:
        b = max(batches)
        try:
            run(f"bf16/B{b}+remat", B=b, dtype="bfloat16", remat=True)
        except Exception as e:
            print(f"[remat] failed: {type(e).__name__}: {e}", flush=True)
    # S4: drift control — f32 B=1 step again
    ctrl = run("f32/B1/ctrl", B=1)

    print(f"\n=== {kind} summary (min over {repeats} rounds of {iters}) ===")
    base = results["f32/B1"][0]["step"]
    drift = ctrl["step"] / base
    for tag, (res, B) in results.items():
        sps = B / res["step"]
        line = (f"{tag:16s} step {res['step']*1e3:9.2f} ms  "
                f"{sps:6.2f} samples/s  ({base/res['step']*B:5.2f}x f32/B1)")
        if "lossfwd" in res:
            line += (f"  [fwd {res['lossfwd']*1e3:.1f} ms, bwd+opt "
                     f"{(res['step']-res['lossfwd'])*1e3:.1f} ms")
            if "denoiser" in res:
                line += (f", solver fwd {res['denoiser']*1e3:.1f} ms"
                         f", DC {(res['denoiser']-res.get('nodc', res['denoiser']))*1e3:.1f} ms")
            line += "]"
        print(line, flush=True)
    print(f"pool drift over the probe (ctrl/base): {drift:.2f}x", flush=True)


if __name__ == "__main__":
    main()
