"""3D PatchGAN discriminator on magnitude cine frames.

The reference repo is named dl-swin-gan and its driver dispatches a SWINGAN
mode (`run_script.sh:45-47,144-155`), but the snapshot ships neither
`scripts/train_swin_gan.py` nor a discriminator — SURVEY calls it out as the
intended extension point: generator = unrolled Swin net, discriminator =
conv net on magnitude frames. This is that discriminator: a spectral-ish
(strided, leaky-ReLU) 3D conv stack producing patch logits.
"""

import jax.numpy as jnp
from flax import linen as nn


class PatchDiscriminator3D(nn.Module):
    """Magnitude video [N, T, Y, X] (or [N, E, T, Y, X] complex -> |emap 0|)
    -> patch logits [N, t', y', x', 1]."""
    features: int = 64
    num_layers: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 5:  # solver-layout complex/real with emap axis
            x = jnp.abs(x[:, 0])
        h = x[..., None]  # [N, T, Y, X, 1]
        feats = self.features
        for i in range(self.num_layers):
            stride = (1, 2, 2) if i == 0 else (2, 2, 2)
            h = nn.Conv(feats, (3, 4, 4), strides=stride, padding="SAME")(h)
            h = nn.leaky_relu(h, 0.2)
            feats = min(feats * 2, 8 * self.features)
        h = nn.Conv(feats, (3, 3, 3), padding="SAME")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (3, 3, 3), padding="SAME")(h)
