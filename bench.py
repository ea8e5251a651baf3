#!/usr/bin/env python
"""Headline benchmark: training throughput of the canonical unrolled-ResNet
workload (configs/basic/example.yaml: 5 unrolls x 2 resblocks x 64 features,
batch = 1 cine slice of 20 phases x 180 x 64, 8 coils, 2 emaps).

Baseline: the reference's only committed throughput number — ~1.0 it/s for
exactly this workload on its CUDA GPU (reference nohup.out epoch lines;
see BASELINE.md). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "it/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IT_S = 1.0  # reference nohup.out: "Epoch 1: ... 1.00it/s"
# reference validation/inference throughput: 2.85 it/s over cine slices of
# ~20 frames (nohup.out "Validating: ... 2.85it/s") -> ~57 frames/s
BASELINE_RECON_FPS = 2.85 * 20


def bench_recon():
    """Reconstruction throughput in frames/sec (BASELINE.md north star:
    >=5x the reference's single-GPU recon throughput)."""
    import jax
    import numpy as np

    from dl_swin_gan_tpu.config import get_cfg
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.models import build_denoiser
    from dl_swin_gan_tpu.solvers import build_solver
    from dl_swin_gan_tpu.train import packing

    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "RES"
    cfg.MODEL.PARAMETERS.NUM_UNROLLS = 5
    cfg.MODEL.PARAMETERS.NUM_RESBLOCKS = 2
    cfg.MODEL.PARAMETERS.NUM_FEATURES = 64
    cfg.MODEL.PARAMETERS.FIX_STEP_SIZE = True
    cfg.MODEL.PARAMETERS.SLWIN_INIT = True
    cfg.MODEL.PARAMETERS.CONV_BLOCK.COMPLEX = False
    cfg.OUTPUT_DIR = "/tmp/bench"

    T, Y, X, C, E = 20, 180, 64, 8, 2
    B = int(os.environ.get("BENCH_BATCH", "4"))
    pre = CinePreprocess(cfg, use_seed=True)
    exs = []
    for b in range(B):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=b)
        exs.append(pre(k, m, t, f"bench_{b}"))
    batch = packing.pack({key: np.stack([e[key] for e in exs])
                          for key in exs[0]})

    # device-resident batch: the axon relay's host->device path is ~40 MB/s,
    # so re-uploading the batch per call would measure the relay, not the TPU
    batch = jax.tree.map(jax.device_put, batch)

    model = build_solver(cfg, lambda: build_denoiser(cfg))
    params = jax.jit(lambda p_: model.init(
        jax.random.PRNGKey(0), packing.unpack(p_)["kspace"],
        packing.unpack(p_)["maps"], packing.unpack(p_)["mask"],
        x0=packing.unpack(p_)["init_image"])["params"])(batch)

    @jax.jit
    def recon(params, packed):
        b = packing.unpack(packed)
        pred = model.apply({"params": params}, b["kspace"], b["maps"],
                           b["mask"], x0=b["init_image"])
        return packing.pack_jnp(pred)

    def sync(t):
        np.asarray(jax.tree.leaves(t)[0].ravel()[0])

    out = recon(params, batch)
    sync(out)
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    best = float("inf")
    for _ in range(int(os.environ.get("BENCH_REPEATS", "3"))):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = recon(params, batch)
        sync(out)
        best = min(best, time.perf_counter() - t0)

    fps = iters * B * T / best
    print(json.dumps({
        "metric": "unrolled_resnet_recon_throughput",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_RECON_FPS, 2),
    }))


def main():
    import jax
    import numpy as np

    from dl_swin_gan_tpu.config import get_cfg
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.models import build_denoiser
    from dl_swin_gan_tpu.solvers import build_solver
    from dl_swin_gan_tpu.train import packing
    from dl_swin_gan_tpu.train.losses import compute_metrics, select_loss
    from dl_swin_gan_tpu.train.train_state import make_optimizer

    # canonical workload (reference configs/basic/example.yaml)
    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "RES"
    cfg.MODEL.META_ARCHITECTURE = "dlespirit"
    cfg.MODEL.PARAMETERS.NUM_UNROLLS = 5
    cfg.MODEL.PARAMETERS.NUM_RESBLOCKS = 2
    cfg.MODEL.PARAMETERS.NUM_FEATURES = 64
    cfg.MODEL.PARAMETERS.NUM_EMAPS = 2
    cfg.MODEL.PARAMETERS.FIX_STEP_SIZE = True
    cfg.MODEL.PARAMETERS.SLWIN_INIT = True
    cfg.MODEL.PARAMETERS.CONV_BLOCK.COMPLEX = False
    cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA = False
    cfg.OUTPUT_DIR = "/tmp/bench"

    T, Y, X, C, E = 20, 180, 64, 8, 2  # stanfordCine slice, post readout-crop
    B = int(os.environ.get("BENCH_BATCH", "1"))

    pre = CinePreprocess(cfg, use_seed=True)
    exs = []
    for b in range(B):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=b)
        exs.append(pre(k, m, t, f"bench_{b}"))
    batch = packing.pack({key: np.stack([e[key] for e in exs]) for key in exs[0]})

    batch = jax.tree.map(jax.device_put, batch)  # see bench_recon note

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

    def sync(tree):
        # block_until_ready does not synchronize on the axon tunnel backend;
        # a device-to-host read of one element does.
        np.asarray(jax.tree.leaves(tree)[0].ravel()[0])

    # warmup (compile) + burn-in
    for _ in range(3):
        params, opt_state = step(params, opt_state, batch)
    sync(params)

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state = step(params, opt_state, batch)
        sync(params)  # steps are chained via donated params; one read flushes all
        best = min(best, time.perf_counter() - t0)
    dt = best

    it_s = iters * B / dt
    print(json.dumps({
        "metric": "unrolled_resnet_train_throughput",
        "value": round(it_s, 3),
        "unit": "it/s",
        "vs_baseline": round(it_s / BASELINE_IT_S, 3),
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_WORKLOAD") == "recon":
        bench_recon()
    else:
        main()
