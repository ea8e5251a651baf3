#!/usr/bin/env python
"""DiT/Latte diffusion train step: f32 vs bf16 transformer trunk, interleaved.

The diffusion workloads sit at 5.8% (DiT) / 7.8% (Latte) MFU with an
all-float32 transformer. CONV_BLOCK.DTYPE now selects the trunk compute
dtype for attention/MLP matmuls (models/dit.py Attention/Mlp) — this
script measures what that's worth on the REAL DiffusionTrainer train step,
both dtypes traced in ONE process and timed interleaved (shared-pool
discipline: never compare wall-clock across runs), plus the denoiser-only
forward to separate model cost from diffusion glue.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_diffusion.py
  env: PROFILE_MODEL=dit|latte (default dit), PROBE_DTYPES=float32,bfloat16,
       BENCH_BATCH, BENCH_ITERS/BENCH_REPEATS, BENCH_SHAPE="T,Y,X,C"
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(kind, dtype, B, T, Y, X, C, E):
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
    return trainer, state, packed


def main():
    import jax

    kind = os.environ.get("PROFILE_MODEL", "dit")
    dtypes = os.environ.get("PROBE_DTYPES", "float32,bfloat16").split(",")
    T, Y, X, C, E = 20, 180, 64, 8, 2
    if os.environ.get("BENCH_SHAPE"):
        T, Y, X, C = (int(v) for v in os.environ["BENCH_SHAPE"].split(","))
    B = int(os.environ.get("BENCH_BATCH", "1"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))

    def sync(t):
        np.asarray(jax.tree.leaves(t)[0]).ravel()

    built = {}
    for dt in dtypes:
        trainer, state, packed = build(kind, dt, B, T, Y, X, C, E)
        s2, metrics = trainer._train_step(state, packed)  # compile
        sync(metrics)
        built[dt] = (trainer, s2, packed)
        print(f"[{kind}] {dt}: compiled, loss0={float(jax.tree.leaves(metrics)[0]):.6f}",
              flush=True)

    best = {dt: float("inf") for dt in dtypes}
    for r in range(repeats):
        for dt, (trainer, state, packed) in built.items():
            t0 = time.perf_counter()
            metrics = None
            for _ in range(iters):
                state, metrics = trainer._train_step(state, packed)
            sync(metrics)
            best[dt] = min(best[dt], (time.perf_counter() - t0) / iters)
            built[dt] = (trainer, state, packed)
            print(f"[round {r}] {kind} {dt:9s} "
                  f"{(time.perf_counter() - t0) / iters * 1e3:8.2f} ms/it",
                  flush=True)

    base = best[dtypes[0]]
    print(f"\n{kind} train step (B={B}, min over {repeats} rounds):")
    for dt in dtypes:
        print(f"  {dt:9s} {best[dt]*1e3:8.2f} ms/it ({B/best[dt]:.2f} it/s, "
              f"{base/best[dt]:.2f}x vs {dtypes[0]})")


if __name__ == "__main__":
    main()
