"""M0 operator-core tests: FFT, fftmod, SENSE adjointness, CG, power method,
utilities, metrics. These are the seams the reference never tested (SURVEY §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl_swin_gan_tpu.ops import (
    fftc, ifftc, fftmod, fft_centered,
    SenseOp, sense_forward, sense_adjoint, sense_normal,
    conjugate_gradient, power_method, zdot,
    root_sum_of_squares, time_average, sliding_window, center_crop, get_mask,
)
from dl_swin_gan_tpu.ops import metrics as M


# ---------------------------------------------------------------- FFT

def test_fft_roundtrip(make_complex):
    x = jnp.asarray(make_complex((2, 3, 16, 20)))
    assert jnp.allclose(ifftc(fftc(x)), x, atol=1e-5)
    assert jnp.allclose(fft_centered(fft_centered(x), adjoint=True), x, atol=1e-5)


def test_fft_matmul_path_matches_xla(make_complex, monkeypatch):
    """The MXU DFT-matmul lowering is numerically the FFT (odd + even sizes,
    both directions, centered and not)."""
    from dl_swin_gan_tpu.ops import fft as F
    x = jnp.asarray(make_complex((2, 3, 15, 22)))
    monkeypatch.setenv("DL_SWIN_GAN_FFT", "xla")
    ref_f = np.asarray(fftc(x))
    ref_i = np.asarray(ifftc(x, centered=True))
    monkeypatch.setenv("DL_SWIN_GAN_FFT", "matmul")
    assert F._mode() == "matmul"
    np.testing.assert_allclose(np.asarray(fftc(x)), ref_f, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ifftc(x, centered=True)), ref_i,
                               atol=2e-5)


def test_fft_ortho_norm(make_complex):
    x = jnp.asarray(make_complex((4, 16, 16)))
    # Parseval: ortho norm preserves energy
    assert np.isclose(float(jnp.sum(jnp.abs(fftc(x)) ** 2)),
                      float(jnp.sum(jnp.abs(x) ** 2)), rtol=1e-5)


def test_fftmod_matches_reference_semantics(make_complex):
    x = np.asarray(make_complex((3, 8, 10)))
    # reference in-place semantics (mri/utils.py:7-19)
    ref = x.copy()
    ref[..., ::2] *= -1
    ref[..., ::2, :] *= -1
    ref *= -1
    out = np.asarray(fftmod(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_fftmod_involution(make_complex):
    x = jnp.asarray(make_complex((4, 6)))
    assert jnp.allclose(fftmod(fftmod(x)), x)


def test_fftmod_equals_centered_shift(make_complex):
    """fftmod(ifft(fftmod(k))) == centered ifft(k) for even dims (the reason
    the reference pipeline can skip fftshifts)."""
    k = jnp.asarray(make_complex((1, 16, 24)))
    a = fftmod(ifftc(fftmod(k)))
    b = fft_centered(k, adjoint=True)
    assert jnp.allclose(a, b, atol=1e-5)


# ---------------------------------------------------------------- SENSE

def _sense_problem(make_complex, B=1, E=2, C=4, T=3, Y=12, X=10):
    x = jnp.asarray(make_complex((B, E, T, Y, X)))
    maps = jnp.asarray(make_complex((B, E, C, 1, Y, X)))
    y = jnp.asarray(make_complex((B, C, T, Y, X)))
    mask = (np.random.RandomState(3).rand(B, 1, T, Y, X) > 0.5).astype(np.float32)
    return x, maps, y, jnp.asarray(mask)


def test_sense_adjointness(make_complex):
    """<A x, y> == <x, A^H y> — the defining property of the adjoint."""
    x, maps, y, mask = _sense_problem(make_complex)
    lhs = zdot(sense_forward(x, maps, mask), y)
    rhs = zdot(x, sense_adjoint(y, maps, mask))
    assert np.isclose(complex(lhs), complex(rhs), rtol=1e-4)


def test_sense_adjointness_no_mask(make_complex):
    x, maps, y, _ = _sense_problem(make_complex)
    lhs = zdot(sense_forward(x, maps), y)
    rhs = zdot(x, sense_adjoint(y, maps))
    assert np.isclose(complex(lhs), complex(rhs), rtol=1e-4)


def test_sense_op_callable(make_complex):
    x, maps, y, mask = _sense_problem(make_complex)
    A = SenseOp(maps, mask)
    assert A(x).shape == y.shape
    assert A(y, adjoint=True).shape == x.shape
    assert jnp.allclose(A.normal(x), sense_normal(x, maps, mask), atol=1e-5)


def test_sense_normal_psd(make_complex):
    """<x, A^H A x> must be real and >= 0."""
    x, maps, _, mask = _sense_problem(make_complex)
    v = complex(zdot(x, sense_normal(x, maps, mask)))
    assert abs(v.imag) < 1e-3 * abs(v.real)
    assert v.real >= 0


# ---------------------------------------------------------------- CG / power method

def test_cg_solves_small_spd():
    rng = np.random.RandomState(1)
    n = 16
    Mmat = rng.randn(n, n) + 1j * rng.randn(n, n)
    Amat = Mmat.conj().T @ Mmat + 0.5 * np.eye(n)
    xt = rng.randn(n) + 1j * rng.randn(n)
    y = Amat @ xt
    A = lambda v: jnp.asarray(Amat) @ v
    # fp32 on device (x64 disabled): CG needs extra iterations vs exact arithmetic
    x = conjugate_gradient(A, jnp.zeros(n, jnp.complex64), jnp.asarray(y), num_iter=3 * n)
    np.testing.assert_allclose(np.asarray(x), xt.astype(np.complex64), rtol=2e-3, atol=2e-3)


def test_cg_sense_normal_equations(make_complex):
    """CG on (A^H A + lam) x = A^H y reduces the residual (MoDL inner solve)."""
    x, maps, y, mask = _sense_problem(make_complex)
    lam = 0.05
    normal = lambda m: sense_normal(m, maps, mask) + lam * m
    rhs = sense_adjoint(y, maps, mask)
    x0 = jnp.zeros_like(rhs)
    xs = conjugate_gradient(normal, x0, rhs, num_iter=20)
    res0 = float(jnp.linalg.norm(rhs - normal(x0)))
    res = float(jnp.linalg.norm(rhs - normal(xs)))
    assert res < 0.2 * res0


def test_cg_unrolled_matches_fori_loop():
    """The trace-unrolled CG (DL_SWIN_GAN_CG_UNROLL / unroll=True) runs the
    identical floating-point iteration as the lax.fori_loop path — values and
    gradients agree to f32 fusion round-off."""
    rng = np.random.RandomState(3)
    n = 12
    Mmat = rng.randn(n, n) + 1j * rng.randn(n, n)
    Amat = Mmat.conj().T @ Mmat + 3.0 * np.eye(n)
    A = lambda v: jnp.asarray(Amat) @ v
    y = jnp.asarray(rng.randn(n) + 1j * rng.randn(n))
    x0 = jnp.zeros(n, jnp.complex64)
    xl = conjugate_gradient(A, x0, y, num_iter=10, unroll=False)
    xu = conjugate_gradient(A, x0, y, num_iter=10, unroll=True)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xl),
                               rtol=1e-4, atol=1e-4)

    def loss(u, unroll):
        x = conjugate_gradient(A, x0, u, num_iter=10, unroll=unroll)
        return jnp.real(jnp.vdot(x, x))

    gl = jax.grad(lambda u: loss(u, False))(y)
    gu = jax.grad(lambda u: loss(u, True))(y)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gl),
                               rtol=1e-4, atol=1e-4)


def test_cg_is_differentiable(make_complex):
    x, maps, y, mask = _sense_problem(make_complex, B=1, E=1, C=2, T=2, Y=8, X=8)
    rhs = sense_adjoint(y, maps, mask)

    def loss(lam):
        normal = lambda m: sense_normal(m, maps, mask) + lam * m
        xs = conjugate_gradient(normal, jnp.zeros_like(rhs), rhs, num_iter=4)
        return jnp.mean(jnp.abs(xs) ** 2)

    g = jax.grad(loss)(0.1)
    assert np.isfinite(float(g))


def test_power_method():
    rng = np.random.RandomState(2)
    A = (rng.randn(3, 10, 8) + 1j * rng.randn(3, 10, 8)).astype(np.complex64)
    sv = power_method(jnp.asarray(A), num_iter=50, key=jax.random.PRNGKey(0))
    # power method on A^H A converges to sigma_max^2
    expected = np.array([np.linalg.svd(A[i], compute_uv=False)[0] ** 2
                         for i in range(3)])
    np.testing.assert_allclose(np.asarray(sv), expected, rtol=1e-3)


# ---------------------------------------------------------------- utils

def test_get_mask(make_complex):
    x = np.asarray(make_complex((2, 8, 8)))
    x[0, :4] = 0
    m = np.asarray(get_mask(jnp.asarray(x)))
    assert m[0, :4].sum() == 0 and m[0, 4:].all()


def test_time_average_ignores_unacquired():
    data = np.zeros((1, 1, 4, 2, 2), np.complex64)
    data[0, 0, 0] = 2.0
    data[0, 0, 2] = 4.0
    avg = np.asarray(time_average(jnp.asarray(data), axis=2))
    np.testing.assert_allclose(avg[0, 0, 0].real, 3.0, rtol=1e-4)


def test_sliding_window_shape_and_full_window(make_complex):
    data = jnp.asarray(np.abs(np.asarray(make_complex((1, 2, 6, 4, 4)))) + 0.1)
    out = sliding_window(data, axis=2, window_size=6)
    assert out.shape == data.shape
    # window covering everything -> every frame equals the full time average
    full = time_average(data, axis=2)
    assert jnp.allclose(out[:, :, 0], full[:, :, 0], atol=1e-4)


def test_center_crop(make_complex):
    x = jnp.asarray(make_complex((2, 3, 16, 20)))
    out = center_crop(x, shapes=[8, 10], axes=[-2, -1])
    assert out.shape == (2, 3, 8, 10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[:, :, 4:12, 5:15])


def test_rss(make_complex):
    x = jnp.asarray(make_complex((4, 8, 8)))
    out = root_sum_of_squares(x, axis=0)
    expected = np.sqrt((np.abs(np.asarray(x)) ** 2).sum(0))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


# ---------------------------------------------------------------- metrics

def test_metrics_basic(make_complex):
    ref = jnp.asarray(make_complex((1, 2, 4, 8, 8)))
    pred = ref + 0.01 * jnp.asarray(make_complex((1, 2, 4, 8, 8)))
    assert float(M.l1(ref, ref)) == 0.0
    assert float(M.l2(ref, ref)) == 0.0
    assert float(M.psnr(ref, pred)) > 20.0
    assert float(M.l1(ref, pred, weight=True)) > 0.0
    assert np.isfinite(float(M.perp_loss(ref, pred)))


def test_calc_weight_matches_unbiased_std(make_complex):
    """Unbiased temporal std, mapped through the reference's scrambled
    repeat_interleave-then-reshape quirk (see ops/metrics.py:calc_weight):
    W[..., t, y, x] = std[..., (t*Y + y) // T, x]."""
    ref = np.asarray(make_complex((1, 2, 5, 4, 4)))
    W = np.asarray(M.calc_weight(jnp.asarray(ref)))
    std = np.abs(np.std(ref, axis=2, ddof=1))
    T_, Y_ = ref.shape[2], ref.shape[3]
    expected = np.empty_like(W)
    for t in range(T_):
        for y in range(Y_):
            expected[:, :, t, y] = std[:, :, (t * Y_ + y) // T_]
    np.testing.assert_allclose(W, expected, rtol=1e-5)
    assert W.shape == ref.shape


def test_paired_cg_matches_two_independent_cgs():
    """paired_conjugate_gradient (the dslr-cg-jacobi engine) must be exactly
    two plain CGs advanced in lockstep — same iterates, separate scalars."""
    from dl_swin_gan_tpu.ops.cg import paired_conjugate_gradient

    rng = np.random.RandomState(3)
    n = 12

    def spd(seed):
        r = np.random.RandomState(seed)
        m = (r.randn(n, n) + 1j * r.randn(n, n)).astype(np.complex64)
        return m @ m.conj().T + 2 * np.eye(n, dtype=np.complex64)

    Ma, Mb = jnp.asarray(spd(1)), jnp.asarray(spd(2))
    ya = jnp.asarray((rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64))
    yb = jnp.asarray((rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64))
    x0 = jnp.zeros(n, jnp.complex64)

    xa1 = conjugate_gradient(lambda v: Ma @ v, x0, ya, num_iter=8,
                             unroll=False)
    xb1 = conjugate_gradient(lambda v: Mb @ v, x0, yb, num_iter=8,
                             unroll=False)
    xa2, xb2 = paired_conjugate_gradient(
        lambda va, vb: (Ma @ va, Mb @ vb), x0, x0, ya, yb, num_iter=8)
    np.testing.assert_allclose(np.asarray(xa2), np.asarray(xa1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xb2), np.asarray(xb1),
                               rtol=1e-4, atol=1e-5)
