"""3D ResNet denoiser for cine volumes.

TPU-native counterpart of reference `dl_cs/models/resnet3d.py:243-317`
(ResNet): pre-activation conv blocks, optional complex-valued convs, circular
padding through time with center-crop undo, global residual, complex channel
count scaled by 1/sqrt(2).

The module maps solver-layout complex images [N, E, T, Y, X] to themselves;
internally it runs channels-last [N, T, Y, X, C].
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from dl_swin_gan_tpu.models.layers import (
    ConvBlock, ResBlock, circular_pad_time, crop_time,
    to_channels_last, to_solver_layout,
)


class ResNet3D(nn.Module):
    num_resblocks: int = 2
    num_emaps: int = 2
    num_features: int = 64
    kernel_size: int = 3
    act_type: str = "relu"
    use_complex_layers: bool = True
    circular_pad: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (self.kernel_size,) * 3
        # parameter-count parity: complex nets get chans/sqrt(2)
        # (reference resnet3d.py:257)
        chans = (int(self.num_features / 1.4142) + 1
                 if self.use_complex_layers else self.num_features)
        pad = ((2 * self.num_resblocks + 2) * (self.kernel_size - 1) // 2
               if self.circular_pad else 0)

        h = to_channels_last(x)  # [N, T, Y, X, E] complex
        if not self.use_complex_layers:
            # [N, T, Y, X, 2E] float (reference cat(real, imag), resnet3d.py:275)
            h = jnp.concatenate([h.real, h.imag], axis=-1)
        in_chans = h.shape[-1]

        h = circular_pad_time(h, pad)
        resid = h
        h = ConvBlock(chans, k, act_type="none",
                      is_complex=self.use_complex_layers)(h)
        for _ in range(self.num_resblocks):
            h = ResBlock(chans, k, act_type=self.act_type,
                         is_complex=self.use_complex_layers)(h)
        h = ConvBlock(in_chans, k, act_type=self.act_type,
                      is_complex=self.use_complex_layers)(h)
        # global residual around the whole stack (reference resnet3d.py:312)
        h = h + resid
        h = crop_time(h, pad)

        if not self.use_complex_layers:
            c = h.shape[-1] // 2
            h = jax.lax.complex(h[..., :c], h[..., c:])
        return to_solver_layout(h)
