"""Complex / magnitude image metrics and losses (pure jnp).

TPU-native counterpart of reference `dl_cs/utils/metrics.py:11-153`. The VGG
perceptual loss lives in `train/perceptual.py` (it needs parameters); SSIM
for offline evaluation lives in `infer/evaluate.py`.
"""

import jax.numpy as jnp


def calc_weight(ref: jnp.ndarray) -> jnp.ndarray:
    """Through-time standard-deviation weighting (`metrics.py:11-17`).

    ref: [N, C, T, Y, X]. torch.std defaults to the unbiased (ddof=1)
    estimator — matched here. Reference quirk replicated deliberately: its
    `repeat_interleave(std, nt, dim=2)` runs on the POST-reduction dim 2
    (which is Y, since T was reduced away), and the subsequent reshape to
    ref.shape scrambles the map to W[..., t, y, x] = std[..., (t*Y+y)//T, x]
    rather than a clean broadcast of the temporal std over T. Training with
    LOSS_WEIGHT only matches the reference through this exact mapping
    (tests/test_train_trajectory_parity.py)."""
    nt = ref.shape[2]
    std = jnp.abs(jnp.std(ref, axis=2, ddof=1))  # [N, C, Y, X]
    rep = jnp.repeat(std, nt, axis=2)            # repeat_interleave over Y
    return rep.reshape(ref.shape)


def _weight(ref: jnp.ndarray, weight: bool) -> jnp.ndarray:
    return calc_weight(ref) if weight else jnp.ones(ref.shape)


def l2(ref: jnp.ndarray, pred: jnp.ndarray, weight: bool = False) -> jnp.ndarray:
    """RMS error, optionally temporal-std weighted (`metrics.py:20-28`)."""
    W = _weight(ref, weight)
    return jnp.sqrt(jnp.mean(jnp.abs(W * (ref - pred)) ** 2))


def l1(ref: jnp.ndarray, pred: jnp.ndarray, weight: bool = False) -> jnp.ndarray:
    """Mean absolute error (`metrics.py:31-39`)."""
    W = _weight(ref, weight)
    return jnp.mean(jnp.abs(W * (ref - pred)))


def psnr(ref: jnp.ndarray, pred: jnp.ndarray, weight: bool = False) -> jnp.ndarray:
    """20*log10(max|ref| / l2) (`metrics.py:121-125`)."""
    scale = jnp.abs(ref).max()
    return 20 * jnp.log10(scale / l2(ref, pred, weight))


def perp_loss(ref: jnp.ndarray, pred: jnp.ndarray, weight: bool = False) -> jnp.ndarray:
    """Perpendicular complex loss (Terpstra et al., ISMRM 2021).

    Reference `perp_loss` (`metrics.py:128-153`): normalized absolute cross
    product between pred and ref plus a magnitude L1 term.
    """
    W = _weight(ref, weight)
    P = jnp.abs(W * pred.real * ref.imag - W * pred.imag * ref.real) / jnp.abs(W * ref)
    M = jnp.abs(jnp.abs(W * ref) - jnp.abs(W * pred))
    return jnp.mean(P + M)
