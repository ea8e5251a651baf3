"""Offline evaluation: SSIM / RMSE / PSNR between reconstructions.

TPU-native counterpart of reference `evaluate.py` (hand-rolled
Gaussian-weighted windowed SSIM cross-checked against skimage) and `eval.py`
(per-slice/phase SSIM + RMSE tables). skimage is not available in this image,
so SSIM is implemented directly (Wang et al. 2004: 11x11 Gaussian window,
sigma=1.5, K1=0.01, K2=0.03) with scipy convolution — the same definition the
reference's vectorized einsum path computes (evaluate.py:60-128).
"""

from typing import Dict, Optional

import numpy as np
from scipy.ndimage import convolve


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size) - size // 2
    g = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = np.outer(g, g)
    return k / k.sum()


def ssim2d(ref: np.ndarray, img: np.ndarray, data_range: Optional[float] = None,
           win_size: int = 11, sigma: float = 1.5,
           full: bool = False):
    """SSIM between two 2D magnitude images (Gaussian-windowed)."""
    ref = np.asarray(ref, np.float64)
    img = np.asarray(img, np.float64)
    if data_range is None:
        data_range = ref.max() - ref.min()
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    k = _gaussian_kernel(win_size, sigma)

    mu1 = convolve(ref, k, mode="nearest")
    mu2 = convolve(img, k, mode="nearest")
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = convolve(ref * ref, k, mode="nearest") - mu1_sq
    s2 = convolve(img * img, k, mode="nearest") - mu2_sq
    s12 = convolve(ref * img, k, mode="nearest") - mu12

    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    if full:
        return ssim_map.mean(), ssim_map
    return ssim_map.mean()


def rmse(ref: np.ndarray, img: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.abs(ref - img) ** 2)))


def psnr(ref: np.ndarray, img: np.ndarray) -> float:
    return float(20 * np.log10(np.abs(ref).max() / (rmse(ref, img) + 1e-30)))


def evaluate_volumes(ref: np.ndarray, recon: np.ndarray,
                     roi: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
    """Per-(slice, phase) SSIM/RMSE/PSNR on magnitude images.

    ref/recon: [slices, E, T, Y, X] complex (first emap evaluated, like the
    reference takes emap channel 0/1 — eval.py:23-37). Optional ROI mask
    [Y, X] restricts the comparison (eval_recon.py ROI masking).
    """
    mref = np.abs(ref[:, 0])    # [S, T, Y, X]
    mrec = np.abs(recon[:, 0])
    if roi is not None:
        mref = mref * roi
        mrec = mrec * roi
    S, T = mref.shape[:2]
    out = {k: np.zeros((S, T)) for k in ("ssim", "rmse", "psnr")}
    for s in range(S):
        rng = mref[s].max() - mref[s].min()
        for t in range(T):
            out["ssim"][s, t] = ssim2d(mref[s, t], mrec[s, t], data_range=rng)
            out["rmse"][s, t] = rmse(mref[s, t], mrec[s, t])
            out["psnr"][s, t] = psnr(mref[s, t], mrec[s, t])
    return out


def evaluate_cfl_pair(recon_path: str, ref_path: str) -> Dict[str, float]:
    """Compare a `<R>accel.im` recon against the `1accel.im` reference
    (the reference parity protocol, evaluate.py:160-241)."""
    from dl_swin_gan_tpu.data import cfl

    def load(path):
        im = cfl.read(path, order="F")       # [x, y, sl, emap, ph, 1, 1, 1]
        im = im.reshape(im.shape[:5])
        return np.transpose(im, (2, 3, 4, 1, 0))  # [sl, emap, ph, y, x]

    ref, rec = load(ref_path), load(recon_path)
    per = evaluate_volumes(ref, rec)
    return {k: float(v.mean()) for k, v in per.items()}
