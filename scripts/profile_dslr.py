#!/usr/bin/env python
"""Component timing for the DSLR (AltMinCGv1) train step.

Times, interleaved in one process (min over repeats):
  full       jitted train step (fwd+bwd+Adam) — the bench.py dslr workload
  fwd        solver forward only
  cg_L       one 10-step CG solve of the L normal equations
  sense      one SENSE normal op on the composed image (the CG inner cost)
  fold       one extract+combine round trip (block overlap-add)
  cnns       the 2D spatial + 1D temporal ResNet updates once

The quality config does 5 unrolls x (CG_L + CG_R) x 10 iters = 100 CG
inner iterations per forward; each inner iteration is one `sense` + one
`fold` + two thin matmuls. This decomposition shows whether DSLR's low MFU
is algorithm shape (sequential small ops) or an implementation sink.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dl_swin_gan_tpu.config import load_cfg
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.ops.cg import conjugate_gradient
    from dl_swin_gan_tpu.ops.llr import BlockOp, btranspose, compose
    from dl_swin_gan_tpu.ops.sense import SenseOp
    from dl_swin_gan_tpu.train import packing
    from dl_swin_gan_tpu.train.dslr_trainer import DSLRTrainer

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_cfg(os.path.join(here, "configs/config_dslr.yaml"),
                   freeze=False)
    cfg.MODEL.STRATEGY = "none"
    cfg.OUTPUT_DIR = "/tmp/profile_dslr"
    cfg.freeze()

    T, Y, X, C, E = 20, 180, 64, 8, 2
    if os.environ.get("BENCH_SHAPE"):
        T, Y, X, C = (int(v) for v in os.environ["BENCH_SHAPE"].split(","))
    pre = CinePreprocess(cfg, use_seed=True, lr_decom=True)
    k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=0)
    ex = pre(k, m, t, "dslr_prof")
    batch = {key: np.asarray(v)[None] for key, v in ex.items()}

    trainer = DSLRTrainer(cfg)
    state = trainer.init_state(batch)
    trainer._build_steps()
    packed = jax.tree.map(jax.device_put, packing.pack(batch))

    p = cfg.MODEL.PARAMETERS
    bs, rank, ncg = p.DSLR.BLOCK_SIZE, p.DSLR.NUM_BASIS, p.DSLR.NUM_CG_STEPS

    @jax.jit
    def fwd(params, packed):
        b = packing.unpack(packed)
        block_op = BlockOp(bs, b["target"].shape)
        out = trainer.model.apply({"params": params}, b["kspace"], b["maps"],
                                  b["mask"], b["L_init"][0], b["R_init"][0],
                                  block_op)
        return jnp.sum(jnp.abs(out))

    @jax.jit
    def cg_L(packed):
        b = packing.unpack(packed)
        block_op = BlockOp(bs, b["target"].shape)
        A = SenseOp(b["maps"], b["mask"])
        L, R = b["L_init"][0], b["R_init"][0]
        ATy_b = block_op(A(b["kspace"], adjoint=True))

        def normal_L(v):
            return block_op(A.normal(compose(v, R, block_op))) @ R

        out = conjugate_gradient(normal_L, L, ATy_b @ R, ncg)
        return jnp.sum(jnp.abs(out))

    @jax.jit
    def sense_once(packed):
        b = packing.unpack(packed)
        A = SenseOp(b["maps"], b["mask"])
        return jnp.sum(jnp.abs(A.normal(b["init_image"])))

    @jax.jit
    def fold_once(packed):
        b = packing.unpack(packed)
        block_op = BlockOp(bs, b["target"].shape)
        return jnp.sum(jnp.abs(block_op(block_op(b["init_image"]),
                                        adjoint=True)))

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0]).ravel()

    # _train_step donates its state: chain it through a holder
    holder = {}
    holder["state"], metrics = trainer._train_step(state, packed)
    sync(metrics)

    def step_fn():
        holder["state"], m = trainer._train_step(holder["state"], packed)
        return m

    sync(fwd(holder["state"].params, packed)); sync(cg_L(packed))
    sync(sense_once(packed)); sync(fold_once(packed))

    iters = int(os.environ.get("BENCH_ITERS", "5"))
    repeats = int(os.environ.get("BENCH_REPEATS", "4"))
    results = {}

    def time_it(name, fn):
        best = results.get(name, float("inf"))
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        results[name] = best

    for _ in range(2):
        time_it("full(train step)", step_fn)
        time_it("fwd(solver)", lambda: fwd(holder["state"].params, packed))
        time_it(f"cg_L({ncg} iters)", lambda: cg_L(packed))
        time_it("sense_normal x1", lambda: sense_once(packed))
        time_it("fold roundtrip x1", lambda: fold_once(packed))

    full_ms = results["full(train step)"] * 1e3
    print(f"\nDSLR step breakdown ({cfg.MODEL.META_ARCHITECTURE}, "
          f"{p.NUM_UNROLLS} unrolls x {ncg} CG, block {bs}, rank {rank}; "
          f"ms, min):")
    for name, dt in results.items():
        print(f"  {name:20s} {dt*1e3:9.2f} ms  ({dt*1e3/full_ms*100:5.1f}% of full)")


if __name__ == "__main__":
    main()
