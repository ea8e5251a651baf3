"""Pallas kernel tests (interpreter mode on CPU): fused window attention
forward + custom-VJP backward vs the XLA reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dl_swin_gan_tpu.kernels.window_attn as WA


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = WA.pl.pallas_call
    monkeypatch.setattr(WA.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, interpret=True, **kw))


def _data(seed=0, W=6, H=2, N=64, D=16, nW=3):
    rng = np.random.RandomState(seed)
    q, k, v = (jnp.asarray(rng.randn(W, H, N, D).astype(np.float32))
               for _ in range(3))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32) * 0.1)
    mask = jnp.asarray(
        np.where(rng.rand(nW, N, N) > 0.7, -100.0, 0.0).astype(np.float32))
    return q, k, v, bias, mask


@pytest.mark.parametrize("with_mask", [True, False])
def test_window_attention_forward(with_mask):
    q, k, v, bias, mask = _data()
    m = mask if with_mask else None
    ref = WA._attention_xla(q, k, v, bias, m)
    out = WA._pallas_attention(q, k, v, bias, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_mask", [True, False])
def test_window_attention_backward(with_mask):
    q, k, v, bias, mask = _data()
    m = mask if with_mask else None

    def loss_p(q_, k_, v_, b_):
        return jnp.sum(WA._window_attention_pallas(q_, k_, v_, b_, m) ** 2)

    def loss_r(q_, k_, v_, b_):
        return jnp.sum(WA._attention_xla(q_, k_, v_, b_, m) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_mask_window_indexing():
    """W > nW exercises the w %% nW mask block mapping."""
    q, k, v, bias, mask = _data(W=9, nW=3)
    ref = WA._attention_xla(q, k, v, bias, mask)
    out = WA._pallas_attention(q, k, v, bias, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_window_attention_sharded_matches_unsharded():
    """shard_map window-parallel attention == single-device result."""
    from dl_swin_gan_tpu.kernels.window_attn import (
        _attention_xla, window_attention_sharded)
    from dl_swin_gan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8, fsdp=1)
    # nW=3: shard extent (24/8=3) is a multiple of the mask period ->
    # replicated-mask fast path; nW=4: ragged alignment -> per-window tile
    for nW in (3, 4):
        q, k, v, bias, mask = _data(W=24, nW=nW)
        for m in (mask, None):
            ref = _attention_xla(q, k, v, bias, m)
            out = window_attention_sharded(q, k, v, bias, m, mesh,
                                           axis="data")
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)


def test_window_attention_bf16_dtype_contract():
    """bf16 q/k/v (CONV_BLOCK.DTYPE=bfloat16 Swin trunk) must flow through
    the Pallas kernel under grad. Regression: hardcoded float32 out_shapes
    made the custom_vjp emit f32 cotangents for bf16 primals — an aval
    mismatch that killed training at the first jax.grad trace."""
    q, k, v, bias, mask = _data()
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    out = WA._window_attention_pallas(qb, kb, vb, bias, mask)
    assert out.dtype == jnp.bfloat16  # XLA fallback contract: q's dtype

    def loss(q_, k_, v_, b_):
        return jnp.sum(
            WA._window_attention_pallas(q_, k_, v_, b_, mask)
            .astype(jnp.float32) ** 2)

    gq, gk, gv, gb = jax.grad(loss, argnums=(0, 1, 2, 3))(qb, kb, vb, bias)
    assert gq.dtype == gk.dtype == gv.dtype == jnp.bfloat16
    assert gb.dtype == jnp.float32  # bias param stays f32
    for g in (gq, gk, gv, gb):
        assert np.isfinite(np.asarray(g, np.float32)).all()
