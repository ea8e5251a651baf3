"""Mask-generator tests: acceleration statistics + bit-exact seeded parity
against the PyTorch reference implementation (loaded from /root/reference as
a golden oracle — never shipped)."""

import importlib.util
import warnings

import numpy as np
import pytest

from dl_swin_gan_tpu.ops.masks import VDktMaskFunc, RandomMaskFunc, subsample, rand_mask

REF_SUBSAMPLE = "/root/reference/dl_cs/mri/subsample.py"


def _load_reference_subsample():
    try:
        spec = importlib.util.spec_from_file_location("ref_subsample", REF_SUBSAMPLE)
        mod = importlib.util.module_from_spec(spec)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


def test_vdkt_shape_and_dtype():
    f = VDktMaskFunc([10, 15])
    out_shape = (1, 1, 18, 80, 64)
    mask = f(out_shape, seed=1000)
    assert mask.shape == out_shape
    assert mask.dtype == np.float32
    assert set(np.unique(mask)).issubset({0.0, 1.0})


def test_vdkt_deterministic_with_seed():
    f = VDktMaskFunc([10, 15])
    m1 = f((1, 1, 18, 80, 64), seed=42)
    m2 = f((1, 1, 18, 80, 64), seed=42)
    np.testing.assert_array_equal(m1, m2)
    m3 = f((1, 1, 18, 80, 64), seed=43)
    assert not np.array_equal(m1, m3)


def test_vdkt_acceleration_in_range():
    """Without partial-echo, the achieved acceleration in the acquired-kx
    region should be near the requested range."""
    f = VDktMaskFunc([10, 15], sim_partial_kx=0.0)
    ny, nt = 120, 20
    mask = f((1, 1, nt, ny, 4), seed=7)
    ktmask = mask[0, 0, :, :, 0]  # [t, ky]
    accel = (ny * nt) / ktmask.sum()
    assert 6 < accel < 20


def test_vdkt_partial_kx_zeroes_readout_head():
    f = VDktMaskFunc([10, 12], sim_partial_kx=0.25)
    nkx = 64
    mask = f((1, 1, 10, 40, nkx), seed=3)
    assert mask[..., :int(0.25 * nkx)].sum() == 0


def test_vdkt_calibration_lines():
    """nCal=N marks N-1 center rows fully sampled (the nCal=1 default is a
    no-op — the reference slice [yCent-1:yCent-1] is empty, subsample.py:219)."""
    f = VDktMaskFunc([10, 15])
    f.rng.seed(0)
    ny = 80
    kt = f._vdkt(ny, 12, 10.0, nCal=4)
    yCent = ny // 2
    assert kt[yCent - 2:yCent + 1, :].all()


def test_vdkt_partial_ky_binary_search():
    f = VDktMaskFunc([10, 12], sim_partial_kx=0.0, sim_partial_ky=0.25)
    ny, nt = 80, 12
    mask = f((1, 1, nt, ny, 2), seed=5)
    ktmask = mask[0, 0, :, :, 0].T  # [ky, t]
    nyMask = int(ny * 0.25)
    assert ktmask[(ny - nyMask):, 0::2].sum() == 0
    assert ktmask[:nyMask, 1::2].sum() == 0


def test_random_mask_calib():
    f = RandomMaskFunc([4, 4], calib_size=8)
    mask = f((1, 32, 32, 1))
    m2d = mask.reshape(32, 32)
    assert m2d[12:20, 12:20].all()


def test_subsample_applies_mask():
    rng = np.random.RandomState(0)
    data = (rng.randn(1, 4, 10, 40, 32) + 1j * rng.randn(1, 4, 10, 40, 32)).astype(np.complex64)
    f = VDktMaskFunc([8, 10])
    masked, mask = subsample(data, f, seed=9, mode="3D")
    assert masked.shape == data.shape
    assert mask.shape == (1, 1, 10, 40, 32)
    np.testing.assert_allclose(masked, data * mask)
    m2 = rand_mask(data, f, seed=9, mode="3D")
    np.testing.assert_array_equal(mask, m2)


@pytest.mark.parametrize("seed", [1000, 1, 77])
def test_vdkt_bit_exact_vs_reference(seed):
    """Golden parity: identical RNG sequence => bit-identical masks, which is
    what makes seeded PSNR/SSIM comparison against the reference valid
    (BASELINE.md parity protocol)."""
    ref = _load_reference_subsample()
    if ref is None:
        pytest.skip("reference unavailable")
    shape = (1, 1, 18, 80, 64)
    ours = VDktMaskFunc([10, 15])(shape, seed=seed)
    theirs = ref.VDktMaskFunc([10, 15])(shape, seed=seed).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_vdkt_partial_ky_bit_exact_vs_reference():
    ref = _load_reference_subsample()
    if ref is None:
        pytest.skip("reference unavailable")
    shape = (1, 1, 12, 80, 32)
    ours = VDktMaskFunc([10, 15], sim_partial_ky=0.25)(shape, seed=5)
    theirs = ref.VDktMaskFunc([10, 15], sim_partial_ky=0.25)(shape, seed=5).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_native_vdkt_bit_exact_vs_python():
    """The C implementation (MT19937 twin) must match the Python path bit for
    bit on every seed type, including the partial-ky binary search."""
    import dl_swin_gan_tpu.ops.native as N
    import os
    if N.get_vdkt_lib() is None:
        pytest.skip("native lib unavailable")

    cases = [
        ((1, 1, 18, 80, 64), 0.25, 0.0, 1000),
        ((1, 1, 18, 80, 64), 0.25, 0.0, tuple(map(ord, "patient_003.h5"))),
        ((1, 1, 12, 80, 32), 0.25, 0.25, 5),
    ]
    for shape, pkx, pky, seed in cases:
        f = VDktMaskFunc([10, 15], sim_partial_kx=pkx, sim_partial_ky=pky)
        # force python path
        os.environ["DL_SWIN_GAN_NO_NATIVE"] = "1"
        N._TRIED, N._LIB = True, None
        py = f(shape, seed=seed)
        os.environ.pop("DL_SWIN_GAN_NO_NATIVE")
        N._TRIED, N._LIB = False, None
        nat = N.vdkt_mask_native(shape[4], shape[3], shape[2], [10, 15],
                                 pkx, pky, seed)
        np.testing.assert_array_equal(py.reshape(nat.shape), nat)


def test_native_vdkt_low_accel_edge_wrap_bit_exact():
    """Regression: at low accelerations the grid-fitting edge walk steps to
    ktMask[-1], which numpy wraps to the last row; the C twin previously
    wrote out of bounds there (ASan heap-buffer-overflow), silently
    corrupting memory and diverging from the Python/reference path. The
    paths must stay bit-exact through the wrap."""
    import dl_swin_gan_tpu.ops.native as N
    import os
    if N.get_vdkt_lib() is None:
        pytest.skip("native lib unavailable")

    shape = (1, 1, 18, 180, 8)
    for seed in (34, 0, 7, 123):  # seed 34 was the ASan repro
        f = VDktMaskFunc([3, 4], sim_partial_kx=0.25, sim_partial_ky=0.25)
        os.environ["DL_SWIN_GAN_NO_NATIVE"] = "1"
        N._TRIED, N._LIB = True, None
        py = f(shape, seed=seed)
        os.environ.pop("DL_SWIN_GAN_NO_NATIVE")
        N._TRIED, N._LIB = False, None
        nat = N.vdkt_mask_native(shape[4], shape[3], shape[2], [3, 4],
                                 0.25, 0.25, seed)
        np.testing.assert_array_equal(py.reshape(nat.shape), nat)


def test_native_vdkt_negative_seed_raises():
    """numpy RandomState rejects negative seeds; the native path previously
    passed an EMPTY key to the C library (out-of-bounds read, garbage RNG)
    instead of raising."""
    import dl_swin_gan_tpu.ops.native as N
    if N.get_vdkt_lib() is None:
        pytest.skip("native lib unavailable")
    with pytest.raises(ValueError):
        N.vdkt_mask_native(8, 32, 4, [10, 15], 0.0, 0.0, -5)
