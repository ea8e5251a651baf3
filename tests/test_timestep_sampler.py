"""Timestep schedule samplers vs the reference
`dl_cs/diffusion/timestep_sampler.py` (vestigial upstream — never imported by
any script — but shipped here as a working component, so it gets value
parity: the loss-second-moment reweighting math, ring-buffer semantics, and
importance-weight formula against the reference's pure-numpy
`update_with_all_losses`/`weights` path, which needs no torch.distributed).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class _FakeDiffusion:
    def __init__(self, num_timesteps):
        self.num_timesteps = num_timesteps


def _load_ref_sampler(num_timesteps, history_per_term):
    try:
        sys.path.insert(0, "/root/reference")
        # reference __init__ uses np.int (removed in numpy>=1.24): shim it
        if not hasattr(np, "int"):
            np.int = int  # noqa: NPY001 — test-only oracle shim
        from dl_cs.diffusion.timestep_sampler import LossSecondMomentResampler
        return LossSecondMomentResampler(
            _FakeDiffusion(num_timesteps), history_per_term=history_per_term)
    except Exception:
        return None


def test_uniform_sampler_range_and_weights():
    from dl_swin_gan_tpu.diffusion.timestep_sampler import UniformSampler

    s = UniformSampler(_FakeDiffusion(50))
    t, w = s.sample(jax.random.PRNGKey(0), 256)
    assert t.shape == (256,) and w.shape == (256,)
    assert int(t.min()) >= 0 and int(t.max()) < 50
    np.testing.assert_array_equal(np.asarray(w), np.ones(256, np.float32))
    # every timestep reachable (256 draws over 50 bins: expect wide coverage)
    assert len(np.unique(np.asarray(t))) > 30


def test_loss_second_moment_matches_reference():
    from dl_swin_gan_tpu.diffusion.timestep_sampler import (
        LossSecondMomentResampler)

    T, K = 7, 3
    ref = _load_ref_sampler(T, K)
    if ref is None:
        pytest.skip("reference unavailable")
    ours = LossSecondMomentResampler(_FakeDiffusion(T), history_per_term=K)
    state = ours.init_state()

    rng = np.random.default_rng(0)
    # feed enough batches to warm every term up AND exercise the ring
    # buffer's shift-out-oldest path several times per timestep
    for _ in range(12):
        ts = rng.integers(0, T, size=5)
        losses = rng.random(5).astype(np.float32)
        ref.update_with_all_losses(list(ts), [float(v) for v in losses])
        state = ours.update_with_losses(state, jnp.asarray(ts),
                                        jnp.asarray(losses))

    history, counts = state
    np.testing.assert_array_equal(np.asarray(counts), ref._loss_counts)
    np.testing.assert_allclose(np.asarray(history), ref._loss_history,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.weights(state)),
                               ref.weights(), rtol=1e-6)

    # importance weights follow the reference formula 1/(T * p[t])
    t, w = ours.sample(jax.random.PRNGKey(1), 64, state)
    p = np.asarray(ours.weights(state))
    np.testing.assert_allclose(np.asarray(w),
                               1.0 / (T * p[np.asarray(t)]), rtol=1e-6)


def test_loss_second_moment_uniform_before_warmup():
    from dl_swin_gan_tpu.diffusion.timestep_sampler import (
        LossSecondMomentResampler)

    T = 5
    ours = LossSecondMomentResampler(_FakeDiffusion(T), history_per_term=4)
    state = ours.init_state()
    np.testing.assert_allclose(np.asarray(ours.weights(state)),
                               np.full(T, 1.0 / T), rtol=1e-6)
    # one partial update must NOT flip to importance weights
    state = ours.update_with_losses(state, jnp.asarray([0, 1]),
                                    jnp.asarray([0.5, 0.25]))
    np.testing.assert_allclose(np.asarray(ours.weights(state)),
                               np.full(T, 1.0 / T), rtol=1e-6)
