"""Fused SENSE normal operator A^H W A as one Pallas kernel.

The unrolled/CG hot loop applies `A.normal(x)` (solvers/unrolled.py:76,
ops/cg.py) — in XLA form that is 5 HBM-materialized stages per call
(coil expand, DFT_y, DFT_x + mask, iDFT_x, iDFT_y, coil combine) over a
[B, C, T, Y, X] coil volume. This kernel runs the whole chain for one
(batch, frame) per grid step with every intermediate in VMEM:

    s_c   = sum_e maps[e,c] * x[e]                  (VPU, complex)
    k_c   = F_y s_c F_x^T                            (MXU, DFT matmuls)
    k_c  *= w                                        (VPU)
    c_c   = conj(F_y) k_c conj(F_x)^T                (MXU)
    out_e = sum_c conj(maps[e,c]) * c_c              (VPU)

The ortho DFT matrix F_n is symmetric unitary, so the inverse is just
conj(F_n) — one matrix pair per axis serves both directions. Complex
arithmetic is explicit (re, im) float32 pairs; matmuls run at
Precision.HIGHEST. maps' block index is t-invariant, so Pallas keeps the
maps tile resident across the inner (frame) grid dimension.

Opt-in via DL_SWIN_GAN_PALLAS_SENSE=1 (TPU only); ops/sense.py falls back
to the XLA path otherwise, and always for per-coil masks.

Measured device-resident on v5e (interleaved, min over repeats): the fused
kernel is numerically exact (4e-6 vs XLA) but ~20% SLOWER than the XLA
matmul-DFT path at cine shapes — XLA batches the DFT contraction over all
(coil, frame) columns into one large GEMM (10k+ columns) with the mask
fused in, which the per-(batch, frame) grid here cannot match (its
[180,180]x[180,64] per-coil dots underfill the MXU). Kept as an honest
measured experiment and a template for shapes where VMEM residency wins
(e.g. many CG iterations chained in one kernel); the DEFAULT normal-op
path is the XLA matmul-DFT lowering in ops/fft.py.
"""

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_PREC = jax.lax.Precision.HIGHEST


def use_pallas_sense() -> bool:
    if os.environ.get("DL_SWIN_GAN_PALLAS_SENSE") != "1" or not _HAS_PALLAS:
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


@lru_cache(maxsize=None)
def _ortho_dft(n: int):
    k = np.arange(n, dtype=np.float64)
    m = np.exp(-2j * np.pi * np.outer(k, k) / n) / np.sqrt(n)
    return (np.ascontiguousarray(m.real, dtype=np.float32),
            np.ascontiguousarray(m.imag, dtype=np.float32))


def _dot(a, b):
    return jnp.dot(a, b, precision=_PREC,
                   preferred_element_type=jnp.float32)


def _c2mm_left(fr, fi, ar, ai):
    """2D complex matmul F @ a (Mosaic handles only 2D dots here)."""
    return (_dot(fr, ar) - _dot(fi, ai), _dot(fr, ai) + _dot(fi, ar))


def _c2mm_right(ar, ai, fr, fi):
    """2D complex matmul a @ F (ortho DFT matrices are symmetric, so
    contracting the last axis with F^T == with F)."""
    return (_dot(ar, fr) - _dot(ai, fi), _dot(ar, fi) + _dot(ai, fr))


def _kernel(xr_ref, xi_ref, mr_ref, mi_ref, w_ref, fyr_ref, fyi_ref,
            fxr_ref, fxi_ref, or_ref, oi_ref):
    E = xr_ref.shape[1]
    C = mr_ref.shape[2]
    w = w_ref[0, 0]               # [Y, X]
    fyr, fyi = fyr_ref[:], fyi_ref[:]
    fxr, fxi = fxr_ref[:], fxi_ref[:]

    xs = [(xr_ref[0, e, 0], xi_ref[0, e, 0]) for e in range(E)]  # [Y, X]
    acc = [(jnp.zeros_like(xs[0][0]), jnp.zeros_like(xs[0][0]))
           for _ in range(E)]

    for c in range(C):
        # coil expansion: s_c = sum_e maps[e,c] * x[e]
        sr = si = 0.0
        for e in range(E):
            mre, mie = mr_ref[0, e, c], mi_ref[0, e, c]
            xre, xie = xs[e]
            sr = sr + mre * xre - mie * xie
            si = si + mre * xie + mie * xre

        # DFT (y then x), mask, inverse DFT (conjugate matrices)
        kr, ki = _c2mm_left(fyr, fyi, sr, si)
        kr, ki = _c2mm_right(kr, ki, fxr, fxi)
        kr = kr * w
        ki = ki * w
        cr, ci = _c2mm_left(fyr, -fyi, kr, ki)
        cr, ci = _c2mm_right(cr, ci, fxr, -fxi)

        # coil combine: out_e += conj(maps[e,c]) * c_c
        for e in range(E):
            mre, mie = mr_ref[0, e, c], mi_ref[0, e, c]
            our, oui = acc[e]
            acc[e] = (our + mre * cr + mie * ci,
                      oui + mre * ci - mie * cr)

    for e in range(E):
        or_ref[0, e, 0] = acc[e][0]
        oi_ref[0, e, 0] = acc[e][1]


def sense_normal_fused(xr, xi, mr, mi, w):
    """xr/xi [B,E,T,Y,X]; mr/mi [B,E,C,Y,X]; w [B,T,Y,X] -> (outr, outi)."""
    B, E, T, Y, X = xr.shape
    C = mr.shape[2]
    fyr, fyi = (jnp.asarray(a) for a in _ortho_dft(Y))
    fxr, fxi = (jnp.asarray(a) for a in _ortho_dft(X))

    x_spec = pl.BlockSpec((1, E, 1, Y, X), lambda b, t: (b, 0, t, 0, 0))
    m_spec = pl.BlockSpec((1, E, C, Y, X), lambda b, t: (b, 0, 0, 0, 0))
    w_spec = pl.BlockSpec((1, 1, Y, X), lambda b, t: (b, t, 0, 0))
    f_spec_y = pl.BlockSpec((Y, Y), lambda b, t: (0, 0))
    f_spec_x = pl.BlockSpec((X, X), lambda b, t: (0, 0))

    outr, outi = pl.pallas_call(
        _kernel,
        grid=(B, T),
        in_specs=[x_spec, x_spec, m_spec, m_spec, w_spec,
                  f_spec_y, f_spec_y, f_spec_x, f_spec_x],
        out_specs=(x_spec, x_spec),
        out_shape=(jax.ShapeDtypeStruct(xr.shape, jnp.float32),
                   jax.ShapeDtypeStruct(xr.shape, jnp.float32)),
    )(xr, xi, mr, mi, w, fyr, fyi, fxr, fxi)
    return outr, outi
