"""Metric dictionary + training-loss dispatch.

TPU-native counterpart of reference `scripts/train.py:46-71`
(LitUnrolled.compute_metrics): complex and magnitude L1/L2/PSNR with
optional temporal-std weighting; the training loss is selected from the
dict by MODEL.RECON_LOSS.NAME.
"""

from typing import Dict

import jax.numpy as jnp

from dl_swin_gan_tpu.ops import metrics as M


def compute_metrics(prediction: jnp.ndarray, target: jnp.ndarray,
                    weight: bool = False, tag: str = "Train",
                    perceptual=None) -> Dict[str, jnp.ndarray]:
    out = {
        f"{tag}/complex_l1": M.l1(target, prediction, weight),
        f"{tag}/complex_l2": M.l2(target, prediction, weight),
        f"{tag}/complex_psnr": M.psnr(target, prediction, weight),
    }
    mp, mt = jnp.abs(prediction), jnp.abs(target)
    out[f"{tag}/mag_l1"] = M.l1(mt, mp, weight)
    out[f"{tag}/mag_l2"] = M.l2(mt, mp, weight)
    out[f"{tag}/mag_psnr"] = M.psnr(mt, mp, weight)
    if perceptual is not None:
        # reference adds these only when selected as the training loss
        # (train.py:56-57, 68-69)
        out[f"{tag}/complex_vggloss"] = perceptual(target, prediction)
        out[f"{tag}/mag_vggloss"] = perceptual(mt, mp)
    return out


def select_loss(metrics: Dict[str, jnp.ndarray], loss_name: str,
                tag: str = "Train") -> jnp.ndarray:
    key = f"{tag}/{loss_name}"
    if key not in metrics:
        raise ValueError(f"Unknown RECON_LOSS.NAME '{loss_name}'; "
                         f"available: {sorted(metrics)}")
    return metrics[key]
