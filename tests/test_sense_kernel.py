"""Fused SENSE-normal Pallas kernel vs the XLA operator chain
(interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dl_swin_gan_tpu.kernels.sense_normal as SN
from dl_swin_gan_tpu.ops.sense import _adjoint_impl, _forward_impl


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = SN.pl.pallas_call
    monkeypatch.setattr(SN.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, interpret=True, **kw))
    monkeypatch.setattr(SN, "use_pallas_sense", lambda: True)


def _data(rng, B=2, E=2, C=4, T=3, Y=12, X=10):
    def c64(*s):
        return (rng.standard_normal(s)
                + 1j * rng.standard_normal(s)).astype(np.complex64)
    x = c64(B, E, T, Y, X)
    maps = c64(B, E, C, 1, Y, X)
    mask = (rng.rand(B, 1, T, Y, X) < 0.4).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(maps), jnp.asarray(mask)


def test_fused_normal_matches_xla_chain(rng):
    x, maps, mask = _data(rng)
    ref = _adjoint_impl(_forward_impl(x, maps, mask), maps, mask)

    m = maps[:, :, :, 0]
    w = jnp.broadcast_to(mask[:, 0], (x.shape[0], x.shape[2],
                                      x.shape[3], x.shape[4]))
    outr, outi = SN.sense_normal_fused(jnp.real(x), jnp.imag(x),
                                       jnp.real(m), jnp.imag(m), w * w)
    out = np.asarray(outr) + 1j * np.asarray(outi)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_normal_no_mask(rng):
    x, maps, _ = _data(rng, B=1, T=2)
    ref = _adjoint_impl(_forward_impl(x, maps, None), maps, None)
    m = maps[:, :, :, 0]
    w = jnp.ones((x.shape[0], x.shape[2], x.shape[3], x.shape[4]), jnp.float32)
    outr, outi = SN.sense_normal_fused(jnp.real(x), jnp.imag(x),
                                       jnp.real(m), jnp.imag(m), w)
    out = np.asarray(outr) + 1j * np.asarray(outi)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_sense_normal_routes_through_fused(rng, monkeypatch):
    """ops.sense.sense_normal picks the fused path when enabled, and its
    custom VJP (self-adjoint) stays correct."""
    import dl_swin_gan_tpu.ops.sense as S

    x, maps, mask = _data(rng, B=1, E=2, C=3, T=2, Y=10, X=8)
    ref = _adjoint_impl(_forward_impl(x, maps, mask), maps, mask)
    out = S.sense_normal(x, maps, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    def loss(v):
        return jnp.sum(jnp.abs(S.sense_normal(v, maps, mask)) ** 2)

    g_fused = jax.grad(loss)(x)

    def loss_ref(v):
        return jnp.sum(jnp.abs(
            _adjoint_impl(_forward_impl(v, maps, mask), maps, mask)) ** 2)

    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-4)
