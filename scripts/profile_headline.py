#!/usr/bin/env python
"""Component-level timing breakdown of the headline train step.

`DL_SWIN_GAN_PROFILE` captures a raw jax.profiler trace, but this image has
no trace viewer — so this script answers the practical question directly:
where does the headline workload's step time go? It times, interleaved in
ONE process (shared-pool discipline, min over repeats):

  full      the complete jitted train step (forward+backward+Adam)
  fwd       forward pass only (value, no grad)
  dc        the 5-unroll SENSE DC chain alone (no denoisers)
  cnn       the 5 denoiser ResNets alone (no DC)
  opt       Adam update alone (precomputed grads)

`fwd - dc - cnn` ~ loss/glue; `full - fwd - opt` ~ backward cost.
Variants: BENCH_BATCH, PROFILE_DTYPE=bfloat16 (trunk compute dtype),
PROFILE_REMAT=1. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_headline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dl_swin_gan_tpu.utils.headline import headline_cfg, headline_shape
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.models import build_denoiser
    from dl_swin_gan_tpu.ops.sense import SenseOp
    from dl_swin_gan_tpu.solvers import build_solver
    from dl_swin_gan_tpu.train import packing
    from dl_swin_gan_tpu.train.losses import compute_metrics, select_loss
    from dl_swin_gan_tpu.train.train_state import make_optimizer

    cfg = headline_cfg(output_dir="/tmp/profile")
    cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA = False
    if os.environ.get("PROFILE_DTYPE"):
        cfg.MODEL.PARAMETERS.CONV_BLOCK.DTYPE = os.environ["PROFILE_DTYPE"]
    if os.environ.get("PROFILE_REMAT"):
        cfg.MODEL.PARAMETERS.GRAD_CHECKPOINT = True

    T, Y, X, C, E = headline_shape()
    B = int(os.environ.get("BENCH_BATCH", "1"))
    pre = CinePreprocess(cfg, use_seed=True)
    exs = []
    for b in range(B):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=b)
        exs.append(pre(k, m, t, f"prof_{b}"))
    batch = packing.pack({key: np.stack([e[key] for e in exs])
                          for key in exs[0]})
    batch = jax.tree.map(jax.device_put, batch)

    model = build_solver(cfg, lambda: build_denoiser(cfg))
    denoiser = build_denoiser(cfg)
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

    @jax.jit
    def full(params, opt_state, packed):
        b = packing.unpack(packed)
        grads = jax.grad(loss_fn)(params, b)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state

    @jax.jit
    def fwd(params, packed):
        return loss_fn(params, packing.unpack(packed))

    @jax.jit
    def dc_only(packed):
        b = packing.unpack(packed)
        A = SenseOp(b["maps"], b["mask"])
        ATy = A(b["kspace"], adjoint=True)
        x = b["init_image"]
        for _ in range(5):
            x = x + (-2.0) * (A.normal(x) - ATy)
        return jnp.sum(jnp.abs(x))

    dparams = jax.jit(lambda packed: denoiser.init(
        jax.random.PRNGKey(1), packing.unpack(packed)["init_image"])["params"]
    )(batch)

    @jax.jit
    def cnn_only(dp, packed):
        x = packing.unpack(packed)["init_image"]
        for _ in range(5):
            x = denoiser.apply({"params": dp}, x)
        return jnp.sum(jnp.abs(x))

    grads0 = jax.jit(lambda p, packed: jax.grad(loss_fn)(
        p, packing.unpack(packed)))(params, batch)

    @jax.jit
    def opt_only(params, opt_state, g):
        updates, opt_state = tx.update(g, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state

    def sync(t):
        np.asarray(jax.tree.leaves(t)[0]).ravel()

    # warm all
    p2, o2 = full(params, opt_state, batch); sync(p2)
    sync(fwd(params, batch)); sync(dc_only(batch))
    sync(cnn_only(dparams, batch))
    p3, o3 = opt_only(params, opt_state, grads0); sync(p3)

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    results = {}

    def time_it(name, fn):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        results[name] = best

    for _ in range(2):  # two interleaved rounds; min absorbs pool noise
        time_it("full", lambda: full(params, opt_state, batch))
        time_it("fwd", lambda: fwd(params, batch))
        time_it("dc(5 unrolls)", lambda: dc_only(batch))
        time_it("cnn(5 resnets)", lambda: cnn_only(dparams, batch))
        time_it("opt(adam)", lambda: opt_only(params, opt_state, grads0))

    print(f"\nheadline step breakdown (B={B}, dtype="
          f"{cfg.MODEL.PARAMETERS.CONV_BLOCK.DTYPE}, "
          f"remat={cfg.MODEL.PARAMETERS.GRAD_CHECKPOINT}, ms/it, min):")
    full_ms = results["full"] * 1e3
    for name, dt in results.items():
        print(f"  {name:16s} {dt*1e3:8.2f} ms  ({dt*1e3/full_ms*100:5.1f}% of full)")
    fwd_ms = results["fwd"] * 1e3
    dc = results["dc(5 unrolls)"] * 1e3
    cnn = results["cnn(5 resnets)"] * 1e3
    opt = results["opt(adam)"] * 1e3
    print(f"  derived: glue/loss ~ {fwd_ms - dc - cnn:.2f} ms, "
          f"backward ~ {full_ms - fwd_ms - opt:.2f} ms")


if __name__ == "__main__":
    main()
