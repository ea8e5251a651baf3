"""Fused (shifted-)window attention kernel for the Swin denoiser.

The Swin trunk's hot op is window attention over B*nW windows of
N = wd*wh*ww tokens (448 for the reference's (7,8,8) window). The XLA path
materializes the [B*nW, heads, N, N] score/probability tensors in HBM for
the backward pass — several GB per layer at cine shapes. This kernel
processes one (window, head) pair per grid step entirely in VMEM:

    s = (q k^T) * scale + rel_pos_bias [+ shift_mask]
    p = softmax(s);  out = p v

and the custom VJP recomputes p on the fly (flash-attention-style
rematerialization; no online softmax needed since a whole window fits VMEM).
Gradients flow to q, k, v and the relative-position bias; the shift mask is
a 0/-100 constant.

The Pallas path is OPT-IN (DL_SWIN_GAN_PALLAS=1): measured device-resident
on v5e, the fused kernel wins in isolation (~25%) but loses ~20% inside the
full unrolled-Swin train step, where XLA fuses the attention into the
surrounding graph. Its advantage is HBM footprint (no materialized
[B*nW, heads, N, N] tensors), which matters at batch sizes this benchmark
doesn't reach; revisit when training at scale.
"""

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _use_pallas() -> bool:
    if os.environ.get("DL_SWIN_GAN_PALLAS") != "1" or not _HAS_PALLAS:
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


# ---------------------------------------------------------------- reference

def _attention_xla(q, k, v, bias, mask):
    """q,k,v: [W, H, N, D]; bias [H, N, N]; mask [nW, N, N] or None.

    Dtype contract: the QK and PV matmuls run in q/k/v's dtype (bf16 under
    a bf16 trunk — full MXU issue rate); bias/mask adds and the softmax run
    in float32; the output carries q's dtype back to the caller.
    """
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("whnd,whmd->whnm", q * scale, k).astype(jnp.float32)
    s = s + bias[None]
    if mask is not None:
        W = q.shape[0]
        nW = mask.shape[0]
        s = s.reshape(W // nW, nW, *s.shape[1:]) + mask[None, :, None]
        s = s.reshape(W, *s.shape[2:])
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("whnm,whmd->whnd", p.astype(v.dtype), v)


# ---------------------------------------------------------------- kernels

def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    scale = q.shape[-1] ** -0.5
    s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
    s = s + bias_ref[0].astype(jnp.float32)
    if mask_ref is not None:
        s = s + mask_ref[0].astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref):
    w = pl.program_id(1)  # grid is (H, W): w innermost so the dbias block
    # for each head is revisited in consecutive steps (safe accumulation)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    scale = q.shape[-1] ** -0.5

    s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
    s = s + bias_ref[0].astype(jnp.float32)
    if mask_ref is not None:
        s = s + mask_ref[0].astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    dv = jnp.dot(p.T, g, preferred_element_type=jnp.float32)
    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * scale

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    # accumulate bias gradient across windows (grid dim 0 revisits the block)
    @pl.when(w == 0)
    def _():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])
    dbias_ref[0] += ds.astype(dbias_ref.dtype)


def _pallas_attention(q, k, v, bias, mask):
    W, H, N, D = q.shape
    qkv_spec = pl.BlockSpec((1, 1, N, D), lambda h, w: (w, h, 0, 0))
    bias_spec = pl.BlockSpec((1, N, N), lambda h, w: (h, 0, 0))
    if mask is not None:
        nW = mask.shape[0]
        mask_spec = pl.BlockSpec((1, N, N), lambda h, w: (w % nW, 0, 0))
        in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec]
        args = (q, k, v, bias, mask)
        kernel = _fwd_kernel
    else:
        in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
        args = (q, k, v, bias)
        kernel = lambda qr, kr, vr, br, orf: _fwd_kernel(qr, kr, vr, br, None, orf)
    return pl.pallas_call(
        kernel,
        grid=(H, W),
        in_specs=in_specs,
        out_specs=qkv_spec,
        # output carries q's dtype — the XLA fallback's dtype contract;
        # cotangents below likewise match their primals (a hardcoded f32
        # crashed jax.grad with a bf16 trunk: aval mismatch on the vjp)
        out_shape=jax.ShapeDtypeStruct((W, H, N, D), q.dtype),
    )(*args)


def _pallas_attention_bwd(q, k, v, bias, mask, g):
    W, H, N, D = q.shape
    qkv_spec = pl.BlockSpec((1, 1, N, D), lambda h, w: (w, h, 0, 0))
    bias_spec = pl.BlockSpec((1, N, N), lambda h, w: (h, 0, 0))
    dbias_spec = pl.BlockSpec((1, N, N), lambda h, w: (h, 0, 0))
    out_shapes = (
        jax.ShapeDtypeStruct((W, H, N, D), q.dtype),
        jax.ShapeDtypeStruct((W, H, N, D), k.dtype),
        jax.ShapeDtypeStruct((W, H, N, D), v.dtype),
        jax.ShapeDtypeStruct((H, N, N), bias.dtype),
    )
    out_specs = (qkv_spec, qkv_spec, qkv_spec, dbias_spec)
    if mask is not None:
        nW = mask.shape[0]
        mask_spec = pl.BlockSpec((1, N, N), lambda h, w: (w % nW, 0, 0))
        in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec, qkv_spec]
        args = (q, k, v, bias, mask, g)
        kernel = _bwd_kernel
    else:
        in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec]
        args = (q, k, v, bias, g)
        kernel = lambda qr, kr, vr, br, gr, dqr, dkr, dvr, dbr: \
            _bwd_kernel(qr, kr, vr, br, None, gr, dqr, dkr, dvr, dbr)
    return pl.pallas_call(
        kernel,
        grid=(H, W),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(*args)


# ---------------------------------------------------------------- public op

@partial(jax.custom_vjp, nondiff_argnums=())
def _window_attention_pallas(q, k, v, bias, mask):
    return _pallas_attention(q, k, v, bias, mask)


def _wa_fwd(q, k, v, bias, mask):
    return _pallas_attention(q, k, v, bias, mask), (q, k, v, bias, mask)


def _wa_bwd(res, g):
    q, k, v, bias, mask = res
    dq, dk, dv, dbias = _pallas_attention_bwd(q, k, v, bias, mask, g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dbias, dmask


_window_attention_pallas.defvjp(_wa_fwd, _wa_bwd)


def window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fused window attention.

    q, k, v: [B*nW, heads, N, head_dim] float32
    bias:    [heads, N, N] relative-position bias (learnable, gets grads)
    mask:    [nW, N, N] additive shift mask or None (constant)
    Returns  [B*nW, heads, N, head_dim].
    """
    if _use_pallas():
        return _window_attention_pallas(q, k, v, bias, mask)
    return _attention_xla(q, k, v, bias, mask)


def window_attention_sharded(q, k, v, bias, mask, mesh, axis: str = "data"):
    """Context-parallel window attention: shard the (B*nW) window axis over a
    mesh axis with shard_map. Windows attend independently (SURVEY §5.7:
    "window attention needs no halo exchange beyond the shift", which happens
    outside this op), so no collectives are needed inside — each chip runs
    the fused kernel on its shard of windows.

    Use for single-volume inference whose window count exceeds one chip's
    appetite; requires W % mesh.shape[axis] == 0.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    W = q.shape[0]
    n = mesh.shape[axis]
    assert W % n == 0, f"window count {W} not divisible by {axis}={n}"

    if mask is None:
        def body(ql, kl, vl, bl):
            return window_attention(ql, kl, vl, bl, None)
        return shard_map(body, mesh=mesh,
                         in_specs=(P(axis), P(axis), P(axis), P()),
                         out_specs=P(axis))(q, k, v, bias)

    # With a shift mask: the mask is nW-periodic over the window axis and
    # window_attention indexes it modulo nW, so when each shard's window
    # offset is itself a multiple of nW the periodic mask can simply be
    # REPLICATED — no [W, N, N] materialization (tiling globally would spike
    # HBM by W/nW x on exactly the large-W volumes this path exists for).
    nW = mask.shape[0]
    if (W // n) % nW == 0:
        def body(ql, kl, vl, bl, ml):
            return window_attention(ql, kl, vl, bl, ml)

        return shard_map(body, mesh=mesh,
                         in_specs=(P(axis), P(axis), P(axis), P(), P()),
                         out_specs=P(axis))(q, k, v, bias, mask)

    # ragged shard/period alignment: fall back to one mask entry per window
    mask_full = jnp.tile(mask, (W // nW, 1, 1))

    def body(ql, kl, vl, bl, ml):
        return window_attention(ql, kl, vl, bl, ml)

    return shard_map(body, mesh=mesh,
                     in_specs=(P(axis), P(axis), P(axis), P(), P(axis)),
                     out_specs=P(axis))(q, k, v, bias, mask_full)
