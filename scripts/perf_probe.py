#!/usr/bin/env python
"""Interleaved perf probe for the canonical unrolled-ResNet train step.

Variants are measured in ONE process on device-resident batches with a
forced D2H sync, min over repeats (the shared-pool methodology from
.claude/skills/verify/SKILL.md). Used to find where the headline bench's
headroom is — results are recorded in README/commit messages, and the
winning defaults get wired into the configs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_step(cfg_overrides):
    import jax

    from dl_swin_gan_tpu.config import get_cfg
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.models import build_denoiser
    from dl_swin_gan_tpu.solvers import build_solver
    from dl_swin_gan_tpu.train import packing
    from dl_swin_gan_tpu.train.losses import compute_metrics, select_loss
    from dl_swin_gan_tpu.train.train_state import make_optimizer

    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "RES"
    cfg.MODEL.META_ARCHITECTURE = "dlespirit"
    cfg.MODEL.PARAMETERS.NUM_UNROLLS = 5
    cfg.MODEL.PARAMETERS.NUM_RESBLOCKS = 2
    cfg.MODEL.PARAMETERS.NUM_FEATURES = 64
    cfg.MODEL.PARAMETERS.FIX_STEP_SIZE = True
    cfg.MODEL.PARAMETERS.SLWIN_INIT = True
    cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA = False
    cfg.OUTPUT_DIR = "/tmp/perf_probe"
    for key, val in cfg_overrides.items():
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        setattr(node, parts[-1], val)

    T, Y, X, C, E = 20, 180, 64, 8, 2
    B = int(os.environ.get("BENCH_BATCH", "1"))
    pre = CinePreprocess(cfg, use_seed=True)
    exs = []
    for b in range(B):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=b)
        exs.append(pre(k, m, t, f"p_{b}"))
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

    def train_step(params, opt_state, packed):
        b = packing.unpack(packed)

        def loss_fn(p):
            pred = model.apply({"params": p}, b["kspace"], b["maps"],
                               b["mask"], x0=b["init_image"])
            metrics = compute_metrics(pred, b["target"], tag="Train")
            return select_loss(metrics, "complex_l1", "Train")

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state

    step = jax.jit(train_step, donate_argnums=(0, 1))
    return step, params, opt_state, batch


def measure(step, params, opt_state, batch, iters=15):
    import jax

    def sync(t):
        np.asarray(jax.tree.leaves(t)[0].ravel()[0])

    for _ in range(2):
        params, opt_state = step(params, opt_state, batch)
    sync(params)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state = step(params, opt_state, batch)
        sync(params)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, params, opt_state


VARIANTS = {
    "baseline(complex,f32)": {},
    "bf16-conv": {"MODEL.PARAMETERS.CONV_BLOCK.DTYPE": "bfloat16"},
    "real-conv": {"MODEL.PARAMETERS.CONV_BLOCK.COMPLEX": False},
    "separable(2+1)D": {"MODEL.PARAMETERS.CONV_BLOCK.SEPARABLE": True},
    "fft-xla": {},   # env-switched below
}


def main():
    built = {}
    for name, ov in VARIANTS.items():
        if name == "fft-xla":
            os.environ["DL_SWIN_GAN_FFT"] = "xla"
        else:
            os.environ.pop("DL_SWIN_GAN_FFT", None)
        built[name] = build_step(ov)
        os.environ.pop("DL_SWIN_GAN_FFT", None)

    results = {name: float("inf") for name in built}
    failed = set()
    for round_i in range(2):  # interleave variants across rounds
        for name, (step, params, opt, batch) in built.items():
            if name in failed:
                continue
            if name == "fft-xla":
                os.environ["DL_SWIN_GAN_FFT"] = "xla"
            try:
                dt, params, opt = measure(step, params, opt, batch)
            except Exception as e:  # a variant that OOMs/fails to compile
                failed.add(name)    # must not kill the whole probe
                print(f"[round {round_i}] {name:24s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            finally:
                os.environ.pop("DL_SWIN_GAN_FFT", None)
            built[name] = (step, params, opt, batch)
            results[name] = min(results[name], dt)
            print(f"[round {round_i}] {name:24s} {dt*1e3:8.2f} ms/it "
                  f"({1.0/dt:6.2f} it/s)", flush=True)

    print("\nbest:")
    base = results["baseline(complex,f32)"]
    for name, dt in sorted(results.items(), key=lambda kv: kv[1]):
        if dt == float("inf"):
            print(f"  {name:24s} (failed)")
        elif base == float("inf"):
            # baseline itself failed to compile: ratios are meaningless
            print(f"  {name:24s} {dt*1e3:8.2f} ms/it")
        else:
            print(f"  {name:24s} {dt*1e3:8.2f} ms/it  {base/dt:5.2f}x vs baseline")


if __name__ == "__main__":
    main()
