"""SSIM oracle parity: the metric every quality-table number rests on.

Two layers of validation (skimage is absent in this image, and the
reference's `eval.py` path needs it — but `evaluate.py`'s hand-rolled
windowed SSIM is pure numpy/scipy and CAN run):

1. `ssim_ref_windowed` is asserted bit-close against the reference's own
   source (`/root/reference/evaluate.py:19-76`), extracted via ast and
   executed as a numpy oracle — the loop `ssim()` variant whose map the
   reference stores in its results (evaluate.py:190-192).
2. `ssim2d` (the standard Wang-et-al metric used by the quality-table CSVs)
   is recomputed through an INDEPENDENT sliding-window-stack code path on
   the interior (where convolve's 'nearest' padding has no effect) — two
   structurally different implementations agreeing to 1e-9 validates the
   windowed-statistics machinery.

Skips gracefully when the reference checkout is absent (CLAUDE.md parity
test convention).
"""

import ast
import os

import numpy as np
import pytest

from dl_swin_gan_tpu.infer.evaluate import (
    _gaussian_kernel, ssim2d, ssim_ref_windowed,
)

REF_EVAL = "/root/reference/evaluate.py"

needs_reference = pytest.mark.skipif(
    not os.path.exists(REF_EVAL), reason="reference checkout not mounted")


def _load_reference_fns():
    """Extract gaus_2d / ssim / ssim_no_loop / mse from the reference source
    without importing the module (its top-level imports need skimage /
    matplotlib, absent here)."""
    from scipy.signal.windows import gaussian

    tree = ast.parse(open(REF_EVAL).read())
    wanted = {"gaus_2d", "ssim", "ssim_no_loop", "mse"}
    mod = ast.Module(
        body=[n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name in wanted],
        type_ignores=[])
    ns = {"np": np, "gaussian": gaussian}
    exec(compile(mod, REF_EVAL, "exec"), ns)
    assert wanted <= set(ns)
    return ns


@needs_reference
@pytest.mark.parametrize("ksize", [5, 8])
def test_ssim_ref_windowed_matches_reference_loop(ksize):
    ref_fns = _load_reference_fns()
    rng = np.random.RandomState(0)
    nx, ny = 40, 36
    base = rng.rand(nx, ny)
    im1 = base + 0.1 * rng.rand(nx, ny)   # "recon"
    im2 = base                             # "fully sampled"
    # the reference protocol z-score normalizes both first (evaluate.py:179-180)
    im1 = (im1 - im1.mean()) / im1.std()
    im2 = (im2 - im2.mean()) / im2.std()

    # oracle: the reference's own loop, verbatim semantics
    # (evaluate.py:78-96 ssim_mse_calc loop path)
    k = (ksize, ksize)
    win_std = max(k) / 2
    w = ref_fns["gaus_2d"](k, win_std)
    data_range = im1.max() - im1.min()
    oracle = np.empty([nx - ksize, ny - ksize])
    for kk in range(nx - ksize):
        for jj in range(ny - ksize):
            ind = (slice(kk, kk + ksize), slice(jj, jj + ksize))
            oracle[kk, jj] = ref_fns["ssim"](
                im1[ind].ravel(), im2[ind].ravel(), w.ravel(), data_range)

    mean, ours = ssim_ref_windowed(im1, im2, ksize=k, full=True)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(mean, oracle.mean(), rtol=1e-9)


@needs_reference
def test_reference_window_is_twinned():
    ref_fns = _load_reference_fns()
    from dl_swin_gan_tpu.infer.evaluate import _gaussian_window_ref
    for ks, std in [((5, 5), 2.5), ((8, 8), 4.0), ((11, 11), 5.5)]:
        np.testing.assert_allclose(_gaussian_window_ref(ks, std),
                                   ref_fns["gaus_2d"](ks, std), rtol=1e-12)


def test_ssim2d_matches_independent_window_stack():
    """ssim2d (convolution implementation) vs a from-scratch sliding-window
    recomputation of the same standard-SSIM definition, on the interior."""
    rng = np.random.RandomState(1)
    n = 48
    ref = rng.rand(n, n)
    img = ref + 0.05 * rng.rand(n, n)
    win, sigma = 11, 1.5
    pad = win // 2
    L = ref.max() - ref.min()
    C1, C2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    k = _gaussian_kernel(win, sigma)   # normalized weights

    from numpy.lib.stride_tricks import sliding_window_view
    w1 = sliding_window_view(ref, (win, win))
    w2 = sliding_window_view(img, (win, win))
    mu1 = (w1 * k).sum(axis=(-2, -1))
    mu2 = (w2 * k).sum(axis=(-2, -1))
    s1 = (w1 ** 2 * k).sum(axis=(-2, -1)) - mu1 ** 2
    s2 = (w2 ** 2 * k).sum(axis=(-2, -1)) - mu2 ** 2
    s12 = (w1 * w2 * k).sum(axis=(-2, -1)) - mu1 * mu2
    expected = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))

    _, full_map = ssim2d(ref, img, full=True)
    np.testing.assert_allclose(full_map[pad:-pad, pad:-pad], expected,
                               rtol=1e-9, atol=1e-12)


def test_ssim_basic_properties():
    rng = np.random.RandomState(2)
    x = rng.rand(64, 64)
    assert ssim2d(x, x) == pytest.approx(1.0)
    assert ssim_ref_windowed(x, x, ksize=(5, 5)) == pytest.approx(1.0, abs=1e-9)
    small = ssim2d(x, x + 0.05 * rng.rand(64, 64))
    big = ssim2d(x, x + 0.5 * rng.rand(64, 64))
    assert 1.0 > small > big
