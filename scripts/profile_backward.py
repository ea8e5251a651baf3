#!/usr/bin/env python
"""Isolate the headline workload's conv backward cost.

profile_headline.py showed backward ~= 77% of the train step (~3.7x the
forward, where a healthy conv backward is ~2x). This probe times, in ONE
process (shared-pool discipline), a bare 6-conv 3x3x3 stack at the trunk's
working shape:

  fwd       forward only
  grad_x    grad wrt the INPUT (chain grad-input convs, no grad-weight)
  grad_p    grad wrt the WEIGHTS (chain + per-layer grad-weight convs)

grad_p - grad_x ~ the grad-weight convs alone — the usual TPU pathology at
small batch. It also times an EXACT temporal-tap reformulation of the same
stack (conv3d == sum over dt of 2D convs on time-shifted slices, identical
weights, identical math) to see whether XLA tiles the 2D grad-weight convs
better; equivalence is asserted numerically before timing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_backward.py
  env: BENCH_SHAPE="T,Y,X,C", PROBE_LAYERS, BENCH_ITERS/BENCH_REPEATS
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    T, Y, X, C = 32, 180, 64, 64  # trunk shape AFTER circular time pad
    if os.environ.get("BENCH_SHAPE"):
        T, Y, X, C = (int(v) for v in os.environ["BENCH_SHAPE"].split(","))
    B = int(os.environ.get("BENCH_BATCH", "1"))
    L = int(os.environ.get("PROBE_LAYERS", "6"))

    rng = np.random.RandomState(0)
    x_np = rng.standard_normal((B, T, Y, X, C)).astype(np.float32)
    ws_np = [rng.standard_normal((3, 3, 3, C, C)).astype(np.float32) * 0.05
             for _ in range(L)]

    x = jax.device_put(x_np)
    ws = jax.device_put(ws_np)

    dn3 = jax.lax.conv_dimension_numbers(
        x_np.shape, ws_np[0].shape, ("NTYXC", "TYXIO", "NTYXC"))

    def conv3d(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1, 1), "SAME", dimension_numbers=dn3)

    def stack3d(ws, v):
        for w in ws:
            v = jax.nn.relu(conv3d(v, w))
        return v

    # exact temporal-tap decomposition: conv3d(v, w)[t] =
    #   sum_dt conv2d(v[t+dt-1], w[dt]) with zero padding at the t edges
    # (identical math, relu unchanged). 2D convs run at batch B*T.
    dn2_shape = (B * T, Y, X, C)
    dn2 = jax.lax.conv_dimension_numbers(
        dn2_shape, (3, 3, C, C), ("NYXC", "YXIO", "NYXC"))

    def conv2p1(v, w):
        nb, nt = v.shape[0], v.shape[1]
        pad = jnp.pad(v, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = 0.0
        for dt in range(3):
            shifted = jax.lax.dynamic_slice_in_dim(pad, dt, nt, axis=1)
            flat = shifted.reshape((nb * nt,) + v.shape[2:])
            o = jax.lax.conv_general_dilated(
                flat, w[dt], (1, 1), "SAME", dimension_numbers=dn2)
            out = out + o.reshape(v.shape[:1] + (nt,) + o.shape[1:])
        return out

    def stack2p1(ws, v):
        for w in ws:
            v = jax.nn.relu(conv2p1(v, w))
        return v

    # channel-concat variant: one 2D conv over [.., 3*C] inputs (kernel
    # reshaped [3,3,3C,C]) — same math, one big MXU op per layer instead of
    # three, at 3x input HBM materialization.
    dnc = jax.lax.conv_dimension_numbers(
        (B * T, Y, X, 3 * C), (3, 3, 3 * C, C), ("NYXC", "YXIO", "NYXC"))

    def convcat(v, w):
        nb, nt = v.shape[0], v.shape[1]
        pad = jnp.pad(v, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        taps = [jax.lax.dynamic_slice_in_dim(pad, dt, nt, axis=1)
                for dt in range(3)]
        cat = jnp.concatenate(taps, axis=-1).reshape(
            (nb * nt, Y, X, 3 * C))
        wk = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape((3, 3, 3 * C, C))
        o = jax.lax.conv_general_dilated(
            cat, wk, (1, 1), "SAME", dimension_numbers=dnc)
        return o.reshape((nb, nt, Y, X, C))

    def stackcat(ws, v):
        for w in ws:
            v = jax.nn.relu(convcat(v, w))
        return v

    builds = {}
    for name, stack in [("conv3d", stack3d), ("tap2p1", stack2p1),
                        ("tapcat", stackcat)]:
        fwd = jax.jit(lambda ws, v, s=stack: jnp.sum(s(ws, v) ** 2))
        gx = jax.jit(jax.grad(lambda v, ws, s=stack: jnp.sum(s(ws, v) ** 2)))
        gp = jax.jit(jax.grad(lambda ws, v, s=stack: jnp.sum(s(ws, v) ** 2)))
        builds[name] = (fwd, gx, gp)

    # numerical equivalence of the two formulations (before any timing)
    y3 = np.asarray(jax.jit(lambda ws, v: stack3d(ws, v))(ws, x))
    for nm, st in [("tap2p1", stack2p1), ("tapcat", stackcat)]:
        y2 = np.asarray(jax.jit(lambda ws, v, s=st: s(ws, v))(ws, x))
        err = np.abs(y3 - y2).max() / max(np.abs(y3).max(), 1e-9)
        print(f"{nm} vs conv3d forward max rel err: {err:.2e}")
        assert err < 2e-3, err  # f32 summation-order roundoff across layers

    def sync(t):
        np.asarray(jax.tree.leaves(t)[0]).ravel()

    # warm all
    for fwd, gx, gp in builds.values():
        sync(fwd(ws, x)); sync(gx(x, ws)); sync(gp(ws, x))

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
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

    for _ in range(2):  # interleave formulations across rounds
        for name, (fwd, gx, gp) in builds.items():
            time_it(f"{name}.fwd", lambda: fwd(ws, x))
            time_it(f"{name}.grad_x", lambda: gx(x, ws))
            time_it(f"{name}.grad_p", lambda: gp(ws, x))

    print(f"\nconv backward probe (B={B} T={T} Y={Y} X={X} C={C}, "
          f"{L} layers, ms/it, min):")
    for name, dt in results.items():
        base = results[f"{name.split('.')[0]}.fwd"]
        print(f"  {name:16s} {dt*1e3:8.2f} ms   ({dt/base:4.2f}x its fwd)")
    print("  derived grad-weight cost: "
          f"conv3d {1e3*(results['conv3d.grad_p']-results['conv3d.grad_x']):.2f} ms, "
          f"tap2p1 {1e3*(results['tap2p1.grad_p']-results['tap2p1.grad_x']):.2f} ms")


if __name__ == "__main__":
    main()
