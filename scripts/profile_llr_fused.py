#!/usr/bin/env python
"""A/B the fused LLR-block SENSE normal kernel (kernels/llr_normal.py)
against the XLA chain on the DSLR solver, interleaved in ONE process.

Measures (min over repeats, device-to-host sync every timing):
  fwd        solver forward (the 5x(2 solves)x(ncg) hot chain)
  cg_L       one L-factor CG solve
  step       full jitted train step (fwd+bwd+Adam)

for base (DL_SWIN_GAN_PALLAS_DSLR off) and fused (on), with a base
control at the end to bound pool drift. Also checks fused-vs-base
forward numerics on device.

Config via LLR_AB_CONFIG (default configs/config_dslr.yaml — the parity
cg-v1 solver; use configs/quality/dslr_fast.yaml for the jacobi paired
mode where the fused kernel batches both systems into one launch).
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
    from dl_swin_gan_tpu.ops.llr import BlockOp, compose
    from dl_swin_gan_tpu.ops.sense import SenseOp
    from dl_swin_gan_tpu.train import packing
    from dl_swin_gan_tpu.train.dslr_trainer import DSLRTrainer

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = os.environ.get("LLR_AB_CONFIG",
                              os.path.join(here, "configs/config_dslr.yaml"))
    cfg = load_cfg(cfg_path, freeze=False)
    cfg.MODEL.STRATEGY = "none"
    cfg.OUTPUT_DIR = "/tmp/profile_llr_fused"
    cfg.freeze()

    T, Y, X, C, E = 20, 180, 64, 8, 2
    if os.environ.get("BENCH_SHAPE"):
        T, Y, X, C = (int(v) for v in os.environ["BENCH_SHAPE"].split(","))
    pre = CinePreprocess(cfg, use_seed=True, lr_decom=True)
    k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=0)
    ex = pre(k, m, t, "llr_ab")
    batch = {key: np.asarray(v)[None] for key, v in ex.items()}

    trainer = DSLRTrainer(cfg)
    state = trainer.init_state(batch)
    packed = jax.tree.map(jax.device_put, packing.pack(batch))

    p = cfg.MODEL.PARAMETERS
    bs, ncg = p.DSLR.BLOCK_SIZE, p.DSLR.NUM_CG_STEPS

    def make_fwd():
        # env is read at TRACE time (solvers/dslr.py use_pallas_llr), so a
        # fresh jit per variant snapshots the on/off state
        @jax.jit
        def fwd(params, packed):
            b = packing.unpack(packed)
            block_op = BlockOp(bs, b["target"].shape)
            out = trainer.model.apply(
                {"params": params}, b["kspace"], b["maps"], b["mask"],
                b["L_init"][0], b["R_init"][0], block_op)
            return jnp.sum(jnp.abs(out)), jnp.real(out[0, 0, 0, 0, :8])

        return fwd

    def make_cg_L():
        @jax.jit
        def cg_L(packed):
            b = packing.unpack(packed)
            block_op = BlockOp(bs, b["target"].shape)
            A = SenseOp(b["maps"], b["mask"])
            L, R = b["L_init"][0], b["R_init"][0]
            ATy_b = block_op(A(b["kspace"], adjoint=True))

            from dl_swin_gan_tpu.kernels.llr_normal import (
                fusable, make_fused_block_normal, use_pallas_llr,
            )
            from dl_swin_gan_tpu.ops.llr import btranspose
            if use_pallas_llr() and fusable(b["maps"], b["mask"]):
                fused = make_fused_block_normal(block_op, b["maps"],
                                                b["mask"])
                normal = lambda v: fused(v @ btranspose(R)) @ R
            else:
                normal = lambda v: block_op(
                    A.normal(compose(v, R, block_op))) @ R
            out = conjugate_gradient(normal, L, ATy_b @ R, ncg)
            return jnp.sum(jnp.abs(out))

        return cg_L

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0]).ravel()

    # _train_step donates its state argument; keep a master copy that is
    # never donated (complex leaves can't round-trip to host on axon, so
    # the copy must be a jitted device-side identity)
    dev_copy = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    state_master = dev_copy(state)

    def make_step():
        trainer._build_steps()
        holder = {"state": dev_copy(state_master)}

        def step_fn():
            holder["state"], m = trainer._train_step(holder["state"], packed)
            return m

        return step_fn, holder

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
        print(f"[{name}] {best*1e3:9.2f} ms", flush=True)

    variants = [("base", "0"), ("fused", "1"), ("base/ctrl", "0")]
    fwd_vals = {}
    for tag, env in variants:
        os.environ["DL_SWIN_GAN_PALLAS_DSLR"] = env
        fwd = make_fwd()
        cg = make_cg_L()
        params = state_master.params
        # warm (compile) + time the forward-path members FIRST so the
        # CG-chain numbers survive a train-step compile failure (r5: the
        # fused adjoint kernel scoped-VMEM-OOMed inside the step)
        s0 = time.perf_counter()
        loss, probe = fwd(params, packed)
        sync(probe)
        print(f"[{tag}] fwd compile+run {time.perf_counter()-s0:.1f}s "
              f"loss={float(np.asarray(loss)):.4f}", flush=True)
        fwd_vals[tag] = np.asarray(probe)
        sync(cg(packed))
        time_it(f"{tag}:fwd", lambda: fwd(params, packed))
        time_it(f"{tag}:cg_L", lambda: cg(packed))
        if os.environ.get("LLR_AB_SKIP_STEP") == "1":
            continue
        try:
            step_fn, holder = make_step()
            sync(step_fn())
            time_it(f"{tag}:step", step_fn)
        except Exception as e:  # noqa: BLE001 — keep fwd/cg results
            print(f"[{tag}:step] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    err = float(np.max(np.abs(fwd_vals["fused"] - fwd_vals["base"])))
    print(f"\nfused-vs-base forward probe max|diff| = {err:.3e}")
    if all(f"{t}:step" in results for t in ("base", "fused", "base/ctrl")):
        base, fused, ctrl = (results[f"{t}:step"]
                             for t in ("base", "fused", "base/ctrl"))
        print(f"step: base {base*1e3:.2f} ms, fused {fused*1e3:.2f} ms "
              f"-> {base/fused:.2f}x  (drift ctrl/base {ctrl/base:.2f}x)")
    for k in ("fwd", "cg_L"):
        b, f = results[f"base:{k}"], results[f"fused:{k}"]
        c = results.get(f"base/ctrl:{k}")
        drift = f" (drift ctrl/base {c/b:.2f}x)" if c else ""
        print(f"{k}: base {b*1e3:.2f} ms, fused {f*1e3:.2f} ms "
              f"-> {b/f:.2f}x{drift}")


if __name__ == "__main__":
    main()
