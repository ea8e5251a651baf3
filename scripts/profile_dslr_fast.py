#!/usr/bin/env python
"""DSLR fast-mode A/B: dslr-cg-v1 (parity) vs dslr-cg-jacobi (opt-in),
traced in ONE process and timed interleaved (CLAUDE.md hazard 2).

The jacobi mode halves the sequential CG chain by pairing the L- and
R-system normal ops into one batch-2 SENSE call per iteration
(solvers/dslr.py). This measures what that buys on the REAL jitted train
step (fwd+bwd+Adam) at the quality-config operating point.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_dslr_fast.py
  env: BENCH_ITERS/BENCH_REPEATS, PROBE_CG_STEPS="10,6" (extra jacobi
       variants at reduced CG iteration counts), BENCH_SHAPE="T,Y,X,C"
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from dl_swin_gan_tpu.config import load_cfg
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.train import packing
    from dl_swin_gan_tpu.train.dslr_trainer import DSLRTrainer

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    T, Y, X, C, E = 18, 156, 96, 8, 2
    if os.environ.get("BENCH_SHAPE"):
        T, Y, X, C = (int(v) for v in os.environ["BENCH_SHAPE"].split(","))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    cg_steps = [int(v) for v in
                os.environ.get("PROBE_CG_STEPS", "10").split(",")]

    def build(meta, n_cg):
        cfg = load_cfg(os.path.join(here, "configs/quality/dslr.yaml"),
                       freeze=False)
        cfg.MODEL.META_ARCHITECTURE = meta
        cfg.MODEL.PARAMETERS.DSLR.NUM_CG_STEPS = n_cg
        cfg.OUTPUT_DIR = "/tmp/profile_dslr_fast"
        cfg.DATALOADER.DEVICE_PIPELINE = False
        cfg.freeze()
        pre = CinePreprocess(cfg, use_seed=True, lr_decom=True)
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=0)
        ex = pre(k, m, t, "dslr_ab")
        batch = {key: np.asarray(v)[None] for key, v in ex.items()}
        trainer = DSLRTrainer(cfg)
        state = trainer.init_state(batch)
        trainer._build_steps()
        packed = jax.tree.map(jax.device_put, packing.pack(batch))
        return trainer, state, packed

    variants = [("cg-v1/10", "dslr-cg-v1", cg_steps[0])]
    variants += [(f"jacobi/{n}", "dslr-cg-jacobi", n) for n in cg_steps]

    built = {}
    for label, meta, n_cg in variants:
        trainer, state, packed = build(meta, n_cg)
        new_state, metrics = trainer._train_step(state, packed)
        np.asarray(jax.tree.leaves(new_state.params)[0]).ravel()
        # keep the warmup OUTPUT: _train_step donates its input state, so
        # reusing `state` after this call is an INVALID_ARGUMENT on TPU
        # (CPU ignores donation, which hid this until the first real run)
        built[label] = (trainer, new_state, packed)
        print(f"{label}: compiled, first-step loss "
              f"{ {k: round(float(v), 5) for k, v in metrics.items()} }")

    best = {k: float("inf") for k in built}
    for _ in range(repeats):
        for label, (trainer, state, packed) in built.items():
            st = state
            t0 = time.perf_counter()
            for _ in range(iters):
                st, _ = trainer._train_step(st, packed)
            np.asarray(jax.tree.leaves(st.params)[0]).ravel()
            best[label] = min(best[label],
                              (time.perf_counter() - t0) / iters)
            built[label] = (trainer, st, packed)  # chain, never reuse donated

    base = best["cg-v1/10"]
    for label in built:
        print(f"{label}: {best[label]*1e3:8.2f} ms/it "
              f"({1/best[label]:.3f} it/s, {base/best[label]:.2f}x vs cg-v1)")


if __name__ == "__main__":
    from bench import _tpu_arbitration

    # pause any live campaign trainer for the measurement (hazard 4)
    with _tpu_arbitration():
        main()
