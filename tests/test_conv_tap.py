"""Temporal-tap conv3d lowering (DL_SWIN_GAN_CONV3D=tap) equivalence.

The tap formulation is a pure relowering — forward, input-grad, and
weight-grad must match XLA's conv3d to f32 round-off, and the param pytree
must keep the historical flax nn.Conv nesting ("Conv_0/kernel") so existing
checkpoints restore.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_swin_gan_tpu.models.layers import ComplexConv, Conv
from dl_swin_gan_tpu.models.resnet import GatedResNet3D

T, Y, X = 6, 12, 10


def _run(monkeypatch, mode, fn, *args):
    monkeypatch.setenv("DL_SWIN_GAN_CONV3D", mode)
    return jax.jit(fn)(*args)  # fresh trace per call: env read at trace time


@pytest.mark.parametrize("mode", ["tap", "tapc"])
def test_real_conv_tap_matches_xla(monkeypatch, mode):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((2, T, Y, X, 5)).astype(np.float32))
    m = Conv(7, (3, 3, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    assert "Conv_0" in params  # checkpoint-compatible nesting

    def fwd(p, v):
        return m.apply({"params": p}, v)

    out_x = _run(monkeypatch, "xla", fwd, params, x)
    out_t = _run(monkeypatch, mode, fwd, params, x)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)

    def loss(p, v):
        return jnp.sum(m.apply({"params": p}, v) ** 2)

    gx = _run(monkeypatch, "xla", jax.grad(loss), params, x)
    gt = _run(monkeypatch, mode, jax.grad(loss), params, x)
    for kx, kt in zip(jax.tree.leaves(gx), jax.tree.leaves(gt)):
        np.testing.assert_allclose(np.asarray(kt), np.asarray(kx),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["tap", "tapc"])
def test_complex_conv_tap_matches_xla(monkeypatch, mode):
    rng = np.random.RandomState(1)
    x = jnp.asarray((rng.standard_normal((1, T, Y, X, 4))
                     + 1j * rng.standard_normal((1, T, Y, X, 4))
                     ).astype(np.complex64))
    m = ComplexConv(6, (3, 3, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]

    def fwd(p, v):
        return jnp.abs(m.apply({"params": p}, v))

    out_x = _run(monkeypatch, "xla", fwd, params, x)
    out_t = _run(monkeypatch, "tap", fwd, params, x)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


def test_even_temporal_kernel_routes_to_xla(monkeypatch):
    """Even kt must bypass the tap path: its symmetric time padding would
    diverge from XLA SAME's asymmetric (lo=(kt-1)//2, hi=kt//2) padding."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.standard_normal((1, T, Y, X, 3)).astype(np.float32))
    m = Conv(4, (2, 3, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]

    def fwd(p, v):
        return m.apply({"params": p}, v)

    out_x = _run(monkeypatch, "xla", fwd, params, x)
    for mode in ("tap", "tapc"):
        out_t = _run(monkeypatch, mode, fwd, params, x)
        np.testing.assert_array_equal(np.asarray(out_t), np.asarray(out_x))


@pytest.mark.parametrize("mode", ["tap", "tapc"])
@pytest.mark.parametrize("use_complex", [False, True])
def test_trunk_tap_matches_xla(monkeypatch, use_complex, mode):
    rng = np.random.RandomState(2)
    x = jnp.asarray((rng.standard_normal((1, 2, T, Y, X))
                     + 1j * rng.standard_normal((1, 2, T, Y, X))
                     ).astype(np.complex64))
    m = GatedResNet3D(num_resblocks=1, num_features=8,
                      use_complex_layers=use_complex)
    params = m.init(jax.random.PRNGKey(0), x)["params"]

    def fwd(p, v):
        return jnp.abs(m.apply({"params": p}, v))

    out_x = _run(monkeypatch, "xla", fwd, params, x)
    out_t = _run(monkeypatch, mode, fwd, params, x)
    ref = np.abs(np.asarray(out_x)).max()
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_x),
                               rtol=1e-4, atol=1e-5 * max(ref, 1.0))
