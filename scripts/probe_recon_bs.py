#!/usr/bin/env python
"""North-star recon operating-point probe: batch-size x trunk-dtype matrix.

The committed north-star number (runs/recon_r4.log: 547 f/s at bs=8 f32)
picked bs=8 without sweeping. This probe times the device-resident recon
at B in {8, 16, 32} x trunk dtype in {float32, bfloat16}, INTERLEAVED in
one process (CLAUDE.md hazard 2: the pool varies 3-4x between sessions,
so cross-session comparisons are meaningless), min over rounds, one JSON
line per config. FFT/DC stay f32 in bf16 mode (hazard 7); trunk bf16 is
quality-lossless per the resbf16 quality row.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_recon_bs.py
Env: PROBE_CONFIGS="8:float32,16:bfloat16,..." overrides the matrix;
     BENCH_ITERS / BENCH_REPEATS as in bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _flops_per_call, _tpu_arbitration, V5E_PEAK_FLOPS


def build(cfg_dtype, B):
    import jax
    import numpy as np

    from dl_swin_gan_tpu.utils.headline import headline_cfg, headline_shape
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.models import build_denoiser
    from dl_swin_gan_tpu.solvers import build_solver
    from dl_swin_gan_tpu.train import packing

    cfg = headline_cfg()
    cfg.MODEL.PARAMETERS.CONV_BLOCK.DTYPE = cfg_dtype

    T, Y, X, C, E = headline_shape()
    pre = CinePreprocess(cfg, use_seed=True)
    exs = []
    for b in range(B):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=b)
        exs.append(pre(k, m, t, f"bench_{b}"))
    batch = packing.pack({key: np.stack([e[key] for e in exs])
                          for key in exs[0]})
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

    return recon, params, batch, T


def main():
    import jax
    import numpy as np

    spec = os.environ.get(
        "PROBE_CONFIGS",
        "8:float32,16:float32,8:bfloat16,16:bfloat16,32:bfloat16")
    configs = [(int(b), d) for b, d in
               (c.split(":") for c in spec.split(","))]

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    reps = int(os.environ.get("BENCH_REPEATS", "4"))

    built = {}
    for B, dt in configs:  # build + compile + warm everything first
        recon, params, batch, T = build(dt, B)
        out = recon(params, batch)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        built[(B, dt)] = (recon, params, batch, T)
        print(f"# compiled B={B} {dt}", file=sys.stderr)

    best = {k: float("inf") for k in built}
    for _ in range(reps):  # round-robin: every round times each config once
        for key, (recon, params, batch, T) in built.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                out = recon(params, batch)
            np.asarray(jax.tree.leaves(out)[0].ravel()[0])
            best[key] = min(best[key], time.perf_counter() - t0)

    for (B, dt), (recon, params, batch, T) in built.items():
        dt_it = best[(B, dt)] / iters
        fps = B * T / dt_it
        rec = {"metric": f"recon_bs{B}_{dt}", "value": round(fps, 1),
               "unit": "frames/s", "vs_baseline": round(fps / 57.0, 3)}
        flops = _flops_per_call(recon, params, batch)
        if flops:
            tf = flops / dt_it / 1e12
            rec["tflops"] = round(tf, 2)
            rec["mfu"] = round(tf * 1e12 / V5E_PEAK_FLOPS, 4)
        print(json.dumps(rec))


if __name__ == "__main__":
    with _tpu_arbitration():
        main()
