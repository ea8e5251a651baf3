"""Fused LLR-block SENSE normal operator for the DSLR CG chain.

The DSLR factor solves are latency-bound: each CG iteration applies
``block_op(A.normal(compose(L, R)))`` — in XLA form a ~10-stage chain of
small ops (batched tiny GEMMs, 6-D fold/unfold transposes, DFT matmuls,
mask, divide) that measures ~3.2 ms/iteration against a ~0.3 ms FLOP
floor (runs/profile_dslr.log), and the whole chain runs 50-100 times
sequentially per training step (reference hot loop: `dl_cs/models/dslr.py`
:258-341 calling `algorithms.py:44-72`).

This module fuses the heavy middle of that chain — block combine ->
SENSE normal (A^H W^2 A) -> block extract — into ONE Pallas kernel with a
sequential grid over (system, frame) and every intermediate in VMEM. The
key enabler is an all-matmul reformulation with zero in-kernel transposes:

  * Block combine/extract are LINEAR per axis: unfold/overlap-add become
    precomputed projection matrices. With the sqrt-Hann window and the
    pad/crop absorbed,

        combine(Blk)_e = Dinv ∘ (P_y^T  Blk_e  P_x)        (two GEMMs)
        extract(X)_e   =          P_y  X_e   P_x^T          (two GEMMs)

    where P_y [nby*b, Y], P_x [nbx*b, X] are dense 0/1-selection matrices
    row-scaled by the 1-D window, and Dinv is the fold-normalization
    (ops/llr.py BlockOp: win :29-33, pad :56-66, weights :71-73).
  * The DFTs are ortho DFT matrix contractions (the TPU lowering of
    ops/fft.py) applied per frame to ALL coils at once: coil images are
    stored [Y, C*X] (tiling IS a GEMM with the [X, C*X] repeated-identity
    matrix, and the coil sum its transpose), F_y applies as one
    [Y,Y]@[Y,C*X] GEMM and F_x as one [Y,C*X]@[C*X,C*X] GEMM against the
    block-diagonal DFT — every in-kernel op is a 2D matmul or elementwise
    (nothing for Mosaic's reshape/concat rules to reject), and the MXU
    sees 512-wide tiles instead of the per-coil [Y,X] slivers that made
    kernels/sense_normal.py lose to XLA. The block-diagonal zeros waste
    C× FLOPs on an op that is ~2% of the kernel's FLOPs — irrelevant in
    the latency-bound regime this kernel targets.

Per-frame working set is ~8 MB (<16 MB VMEM); the big factor tensors stay
in HBM and stream through the grid. The tiny per-block factor GEMMs
(L @ R^H and the projections back onto the factors) and the CG scalar
recurrences remain XLA — they are a few percent of the FLOPs.

The operator is linear; its adjoint is the same kernel with Dinv applied
AFTER the SENSE normal instead of before (P real, D real, A^H W^2 A
Hermitian), so the custom VJP reuses the fused path like ops/sense.py.

Opt-in via DL_SWIN_GAN_PALLAS_DSLR=1 (TPU only); `llr_normal_matrix` is
the same math as plain XLA ops and serves CPU/tests and as the measured
baseline.

MEASURED (round 5, runs/profile_llr_fused_r5.log, interleaved with drift
control 1.00-1.02x): the fused kernel is numerically correct on device
(forward probe max|diff| 2.4e-3 on O(1) values) but SLOWER than the XLA
chain it replaces — solver forward 0.86x, single CG factor solve 0.93x.
The latency-bound XLA chain was already pipelining its ~10 stages across
frames; one sequential (system, frame) Pallas grid serializes that
overlap, and the all-matmul reformulation's extra FLOPs (dense projection
GEMMs, block-diag DFT) cost more than the dispatch overhead they remove.
Kept opt-in (off by default) as measured documentation of the approach;
see docs/ARCHITECTURE.md "kernels/" close-out.
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


def use_pallas_llr() -> bool:
    if os.environ.get("DL_SWIN_GAN_PALLAS_DSLR") != "1" or not _HAS_PALLAS:
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Geometry: projection matrices + layout converters for one BlockOp
# ---------------------------------------------------------------------------

def projection_matrices(block_op):
    """(P_y [nby*b, Y], P_x [nbx*b, X], dinv [Y, X]) for a BlockOp.

    P row j = block_index*stride + in_block_pos selects the padded pixel,
    scaled by the 1-D sqrt-Hann window at in_block_pos; the pad columns are
    dropped so P maps directly to the CROPPED image grid (extract's pad and
    combine's crop use the same centered offset, ops/llr.py:56-66,133-135).
    """
    b, s = block_op.block_size, block_op.stride
    n = np.arange(b)
    w1d = (0.5 * (1 - np.cos(2 * np.pi * n / b))) ** 0.5

    def axis_mat(num_blocks, pad_lo, size):
        m = np.zeros((num_blocks * b, size), np.float32)
        for blk in range(num_blocks):
            for i in range(b):
                col = blk * s + i - pad_lo
                if 0 <= col < size:
                    m[blk * b + i, col] = w1d[i]
        return m

    py = axis_mat(block_op.num_blocks_y, block_op.pad_y[0], block_op.ny)
    px = axis_mat(block_op.num_blocks_x, block_op.pad_x[0], block_op.nx)
    # fold normalization combine(extract(ones)) is separable in (y, x):
    # each axis contributes sum-over-covering-blocks of w1d^2, which is the
    # column sum of the squared projection matrix — pure numpy, so BlockOp
    # may be constructed inside a jit trace (trainer/profiler path) without
    # materializing its traced `weights` (tests pin this against
    # block_op.weights on concrete arrays)
    w = (py ** 2).sum(0)[:, None] * (px ** 2).sum(0)[None, :]
    dinv = (1.0 / (w + 1e-8)).astype(np.float32)
    return py, px, dinv


def blocks_to_mats(blocks, block_op):
    """[N, e*b*b, T] -> [T, E, nby*b, nbx*b] (free-reshape kernel layout).

    N is (by, bx) row-major and e*b*b is (e, i, j) e-major (ops/llr.py
    _unfold :79-96), so this is one reshape + one transpose.
    """
    b = block_op.block_size
    nby, nbx, e = block_op.num_blocks_y, block_op.num_blocks_x, block_op.ne
    t = blocks.shape[-1]
    v = blocks.reshape(nby, nbx, e, b, b, t)
    v = v.transpose(5, 2, 0, 3, 1, 4)  # [T, e, nby, i, nbx, j]
    return v.reshape(t, e, nby * b, nbx * b)


def mats_to_blocks(mats, block_op):
    """Inverse of blocks_to_mats."""
    b = block_op.block_size
    nby, nbx, e = block_op.num_blocks_y, block_op.num_blocks_x, block_op.ne
    t = mats.shape[0]
    v = mats.reshape(t, e, nby, b, nbx, b)
    v = v.transpose(2, 4, 1, 3, 5, 0)  # [nby, nbx, e, i, j, T]
    return v.reshape(block_op.num_blocks, e * b * b, t)


@lru_cache(maxsize=None)
def _ortho_dft(n: int):
    k = np.arange(n, dtype=np.float64)
    m = np.exp(-2j * np.pi * np.outer(k, k) / n) / np.sqrt(n)
    return (np.ascontiguousarray(m.real, dtype=np.float32),
            np.ascontiguousarray(m.imag, dtype=np.float32))


# ---------------------------------------------------------------------------
# Reference math (plain XLA): combine -> A^H W^2 A -> extract, matrix form
# ---------------------------------------------------------------------------

def llr_normal_matrix(blk, maps, w2, py, px, dinv, d_side="pre"):
    """blk [S, T, E, YB, XB] complex -> same shape.

    maps [E, C, Y, X] complex, w2 [T, Y, X] real (mask weights SQUARED —
    forward and adjoint each apply W once), py [YB, Y], px [XB, X],
    dinv [Y, X]. d_side='pre' is the primal (combine divides by the fold
    weights); 'post' is the adjoint (VJP) variant.
    """
    # img[y, x] = sum_k sum_l py[k, y] blk[..., k, l] px[l, x]
    img = jnp.einsum("ky,stekl,lx->steyx", py, blk, px, precision=_PREC)
    if d_side == "pre":
        img = img * dinv
    coil = jnp.sum(img[:, :, :, None] * maps[None, None], axis=2)  # [S,T,C,Y,X]
    fy_r, fy_i = _ortho_dft(py.shape[1])
    fx_r, fx_i = _ortho_dft(px.shape[1])
    fy = jnp.asarray(fy_r) + 1j * jnp.asarray(fy_i)
    fx = jnp.asarray(fx_r) + 1j * jnp.asarray(fx_i)
    k = jnp.einsum("yz,stczx->stcyx", fy, coil, precision=_PREC)
    k = jnp.einsum("stcyz,xz->stcyx", k, fx, precision=_PREC)
    k = k * w2[None, :, None]
    k = jnp.einsum("yz,stczx->stcyx", jnp.conj(fy), k, precision=_PREC)
    k = jnp.einsum("stcyz,xz->stcyx", k, jnp.conj(fx), precision=_PREC)
    out = jnp.sum(k[:, :, None] * jnp.conj(maps)[None, None], axis=3)
    if d_side == "post":
        out = out * dinv
    return jnp.einsum("ky,steyx,lx->stekl", py, out, px, precision=_PREC)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _dot(a, b):
    return jnp.dot(a, b, precision=_PREC, preferred_element_type=jnp.float32)


def _cmm_rr(ar, ai, m):
    """complex [*,*] @ real m."""
    return _dot(ar, m), _dot(ai, m)


def _rr_cmm(m, ar, ai):
    return _dot(m, ar), _dot(m, ai)


def _cmm_cc_left(fr, fi, ar, ai):
    """(fr+ifi) @ (ar+iai)."""
    return _dot(fr, ar) - _dot(fi, ai), _dot(fr, ai) + _dot(fi, ar)


def _cmm_cc_right(ar, ai, fr, fi):
    return _dot(ar, fr) - _dot(ai, fi), _dot(ar, fi) + _dot(ai, fr)


def _make_kernel(E, C, Y, X, YB, XB, d_pre):
    """Everything is a 2D GEMM or an elementwise op — no in-kernel
    reshape/concatenate for Mosaic to reject. Coil tiling is a GEMM with
    the [X, C*X] repeated-identity matrix; the F_x DFT over every coil
    block is one GEMM with the [C*X, C*X] block-diagonal DFT; the coil
    sum is the tile matrix transposed."""
    def kernel(br_ref, bi_ref, mr_ref, mi_ref, w2_ref, dinv_ref,
               py_ref, pyt_ref, px_ref, pxt_ref, fyr_ref, fyi_ref,
               fxbr_ref, fxbi_ref, tile_ref, tilet_ref, or_ref, oi_ref):
        # transposed partners are separate inputs — Mosaic restricts
        # in-kernel 2D transposes; these are trace-time constants anyway
        py, pyt = py_ref[:], pyt_ref[:]   # [YB, Y], [Y, YB]
        px, pxt = px_ref[:], pxt_ref[:]   # [XB, X], [X, XB]
        dinv = dinv_ref[:]                # [Y, X]
        w2c = w2_ref[0]                   # [Y, C*X] (pre-tiled)
        fyr, fyi = fyr_ref[:], fyi_ref[:]
        fxbr, fxbi = fxbr_ref[:], fxbi_ref[:]   # block-diag [C*X, C*X]
        tile, tilet = tile_ref[:], tilet_ref[:]  # [X, C*X], [C*X, X]

        # combine: img_e = [Dinv ∘] (P_y^T Blk_e P_x), then coil expand
        # s = sum_e maps_e ∘ (img_e @ tile)          [Y, C*X]
        sr = jnp.zeros((Y, C * X), jnp.float32)
        si = jnp.zeros((Y, C * X), jnp.float32)
        for e in range(E):
            hr, hi = _rr_cmm(pyt, br_ref[0, 0, e], bi_ref[0, 0, e])
            xr, xi = _cmm_rr(hr, hi, px)
            if d_pre:
                xr, xi = xr * dinv, xi * dinv
            xtr, xti = _cmm_rr(xr, xi, tile)
            mre, mie = mr_ref[e], mi_ref[e]
            sr = sr + mre * xtr - mie * xti
            si = si + mre * xti + mie * xtr

        # F_y: [Y,Y]@[Y,C*X]; F_x: [Y,C*X]@[C*X,C*X] block-diag; mask; back
        kr, ki = _cmm_cc_left(fyr, fyi, sr, si)
        kr, ki = _cmm_cc_right(kr, ki, fxbr, fxbi)
        kr, ki = kr * w2c, ki * w2c
        kr, ki = _cmm_cc_right(kr, ki, fxbr, -fxbi)
        kr, ki = _cmm_cc_left(fyr, -fyi, kr, ki)

        # coil combine (sum of coil blocks = @ tile^T) + extract to blocks
        for e in range(E):
            mre, mie = mr_ref[e], mi_ref[e]
            gr, gi = _cmm_rr(mre * kr + mie * ki, mre * ki - mie * kr,
                             tilet)
            if not d_pre:
                gr, gi = gr * dinv, gi * dinv
            hr, hi = _rr_cmm(py, gr, gi)
            br, bi = _cmm_rr(hr, hi, pxt)
            or_ref[0, 0, e] = br
            oi_ref[0, 0, e] = bi

    return kernel


@lru_cache(maxsize=None)
def _coil_consts(C: int, X: int):
    """(tile [X, C*X], fx block-diag re/im [C*X, C*X]) trace-time consts."""
    fx_r, fx_i = _ortho_dft(X)
    eye = np.eye(C, dtype=np.float32)
    tile = np.tile(np.eye(X, dtype=np.float32), (1, C))
    return (tile,
            np.kron(eye, fx_r).astype(np.float32),
            np.kron(eye, fx_i).astype(np.float32))


def _llr_normal_pallas(blk_r, blk_i, maps_cols_r, maps_cols_i, w2_cols,
                       py, px, dinv, d_pre):
    S, T, E, YB, XB = blk_r.shape
    _, Y, CX = maps_cols_r.shape
    X = dinv.shape[-1]
    C = CX // X
    fy_r, fy_i = (jnp.asarray(a) for a in _ortho_dft(Y))
    tile, fxb_r, fxb_i = (jnp.asarray(a) for a in _coil_consts(C, X))

    blk_spec = pl.BlockSpec((1, 1, E, YB, XB), lambda s, t: (s, t, 0, 0, 0))
    maps_spec = pl.BlockSpec((E, Y, CX), lambda s, t: (0, 0, 0))
    w2_spec = pl.BlockSpec((1, Y, CX), lambda s, t: (t, 0, 0))
    fix2 = lambda shape: pl.BlockSpec(shape, lambda s, t: (0,) * len(shape))

    outr, outi = pl.pallas_call(
        _make_kernel(E, C, Y, X, YB, XB, d_pre),
        grid=(S, T),
        in_specs=[blk_spec, blk_spec, maps_spec, maps_spec, w2_spec,
                  fix2((Y, X)), fix2((YB, Y)), fix2((Y, YB)),
                  fix2((XB, X)), fix2((X, XB)),
                  fix2((Y, Y)), fix2((Y, Y)), fix2((CX, CX)),
                  fix2((CX, CX)), fix2((X, CX)), fix2((CX, X))],
        out_specs=(blk_spec, blk_spec),
        out_shape=(jax.ShapeDtypeStruct(blk_r.shape, jnp.float32),
                   jax.ShapeDtypeStruct(blk_r.shape, jnp.float32)),
    )(blk_r, blk_i, maps_cols_r, maps_cols_i, w2_cols, dinv,
      py, jnp.transpose(py), px, jnp.transpose(px),
      fy_r, fy_i, fxb_r, fxb_i, tile, jnp.transpose(tile))
    return outr, outi


def _maps_cols(maps):
    """[E, C, Y, X] complex -> [E, Y, C*X] real pair (column-stacked)."""
    e, c, y, x = maps.shape
    m = jnp.transpose(maps, (0, 2, 1, 3)).reshape(e, y, c * x)
    return jnp.real(m), jnp.imag(m)


def _apply_fused(blk, maps, w2, py, px, dinv, d_side):
    mcr, mci = _maps_cols(maps)
    c = maps.shape[1]
    w2_cols = jnp.tile(w2.astype(jnp.float32), (1, 1, c))  # [T, Y, C*X]
    outr, outi = _llr_normal_pallas(
        jnp.real(blk), jnp.imag(blk), mcr, mci,
        w2_cols, py, px, dinv, d_side == "pre")
    return jax.lax.complex(outr, outi)


@jax.custom_vjp
def llr_normal_fused(blk, maps, w2, py, px, dinv):
    """Fused combine -> A^H W^2 A -> extract. blk [S, T, E, YB, XB] complex.

    Linear in blk; adjoint = same kernel with Dinv post-applied, so the VJP
    is conj(adjoint(conj(g))) exactly as in ops/sense.py. maps/w2 get zero
    cotangents (acquisition data, structurally unused gradients here).
    """
    return _apply_fused(blk, maps, w2, py, px, dinv, "pre")


def _fused_fwd(blk, maps, w2, py, px, dinv):
    return _apply_fused(blk, maps, w2, py, px, dinv, "pre"), (maps, w2, py,
                                                              px, dinv)


def _fused_bwd(res, g):
    maps, w2, py, px, dinv = res
    # The adjoint runs as the plain-XLA matrix twin, not a second Pallas
    # launch: the 'post' kernel's scoped-VMEM footprint (double-buffered
    # fixed operands incl. the [CX,CX] block-diag DFT pair) exceeds the
    # 16 MB stack limit when embedded in the full train step (measured r5:
    # 18.71M, compile-time OOM), while the forward kernel fits. Training
    # therefore gets fused-forward + XLA-backward; the inference/CG hot
    # chain (forward-only) is fully fused.
    gbar = jnp.conj(llr_normal_matrix(jnp.conj(g), maps, w2, py, px, dinv,
                                      "post"))
    return (gbar, jnp.zeros_like(maps), jnp.zeros_like(w2),
            jnp.zeros_like(py), jnp.zeros_like(px), jnp.zeros_like(dinv))


llr_normal_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Solver-facing wiring: blocks -> fused normal -> blocks
# ---------------------------------------------------------------------------

def fusable(maps, mask) -> bool:
    """The fused path covers the solver's actual operating point: one
    system (B=1 — the DSLR trainer vmaps beyond that), one map channel
    dim, and a coil-shared (or absent) mask."""
    if maps.ndim != 6 or maps.shape[0] != 1 or maps.shape[3] != 1:
        return False
    if mask is not None and (mask.ndim != 5 or mask.shape[0] != 1
                             or mask.shape[1] != 1):
        return False
    return True


def make_fused_block_normal(block_op, maps, mask):
    """Return f(blocks [N, e*b^2, t] [, blocks2]) computing

        block_op(A.normal(block_op(blocks, adjoint=True)))

    via the fused kernel (A = SenseOp(maps, mask)). When a second blocks
    argument is given, BOTH systems run in one kernel launch (grid S=2) —
    the batched operator the jacobi paired-CG mode needs.
    """
    t, y, x = block_op.nt, block_op.ny, block_op.nx
    py_np, px_np, dinv_np = projection_matrices(block_op)
    py = jnp.asarray(py_np)
    px = jnp.asarray(px_np)
    dinv = jnp.asarray(dinv_np)
    m = maps[0, :, :, 0]  # [E, C, Y, X]
    if mask is None:
        w2 = jnp.ones((t, y, x), jnp.float32)
    else:
        w = jnp.broadcast_to(mask[0, 0], (t, y, x))
        w2 = jnp.real(w * w).astype(jnp.float32)

    def f(blocks, blocks2=None):
        mats = blocks_to_mats(blocks, block_op)[None]  # [1, T, E, YB, XB]
        if blocks2 is not None:
            mats = jnp.concatenate(
                [mats, blocks_to_mats(blocks2, block_op)[None]], axis=0)
        out = llr_normal_fused(mats, m, w2, py, px, dinv)
        if blocks2 is None:
            return mats_to_blocks(out[0], block_op)
        return (mats_to_blocks(out[0], block_op),
                mats_to_blocks(out[1], block_op))

    return f
