"""Time-conditioned Swin denoiser for diffusion reconstruction.

TPU-native counterpart of reference `dl_cs/models/swin3D_diff.py` (a
diffusion-conditioned Swin experiment: sinusoidal timestep embedding
:17-32, schedule helpers :34-48, a conditioned SwinTransformer3DNet :500+;
superseded upstream by the DiT/Latte path and never imported by scripts).
Here it is a working member of the diffusion zoo: the SwinIR-style trunk
from models/swin.py with FiLM (scale/shift) timestep+label conditioning
between stages, exposing the (x, t, y) signature the diffusion solvers
expect — usable via MODEL.MODEL_TYPE: "SWIN_DIFF".
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dl_swin_gan_tpu.models.dit import LabelEmbedder, TimestepEmbedder
from dl_swin_gan_tpu.models.layers import (
    ConvBlock, circular_pad_time, crop_time, to_channels_last,
    to_solver_layout,
)
from dl_swin_gan_tpu.models.swin import SwinTransformer3D


class SwinDiffNet(nn.Module):
    """(x, t, y) -> x denoiser: SFE conv -> FiLM(t,y) -> Swin -> FiLM -> conv."""
    num_swinblocks: int = 1
    num_emaps: int = 2
    hidden_size: int = 96
    kernel_size: int = 3
    depths: Tuple[int, ...] = (2,)
    num_heads: Tuple[int, ...] = (4,)
    window_size: Tuple[int, int, int] = (7, 8, 8)
    patch_size: Tuple[int, int, int] = (4, 4, 4)
    num_blocks: int = 2          # circular pad extent
    num_classes: int = 1
    learn_sigma: bool = False
    circular_pad: bool = True
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, t, y):
        k = (self.kernel_size,) * 3
        chans = self.hidden_size
        pad = ((2 * self.num_blocks + 2) * (self.kernel_size - 1) // 2
               if self.circular_pad else 0)

        h = to_channels_last(x)
        h = jnp.concatenate([h.real, h.imag], axis=-1)
        in_chans = h.shape[-1]
        h = circular_pad_time(h, pad)

        temb = TimestepEmbedder(chans, name="t_embedder")(t)
        yemb = LabelEmbedder(self.num_classes, chans, 0.1,
                             deterministic=self.deterministic,
                             name="y_embedder")(y)
        c = nn.silu(temb + yemb)

        h = ConvBlock(chans, k, act_type="none", name="SFE")(h)

        def film(v, name):
            mod = nn.Dense(2 * chans, kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros, name=name)(c)
            scale, shift = jnp.split(mod, 2, axis=-1)
            bc = (slice(None),) + (None,) * (v.ndim - 2)
            return v * (1 + scale[bc]) + shift[bc]

        res = h
        for i in range(self.num_swinblocks):
            h = film(h, f"film_in_{i}")
            h = SwinTransformer3D(
                in_chans=chans, embed_dim=chans, patch_size=self.patch_size,
                depths=self.depths, num_heads=self.num_heads,
                window_size=self.window_size, drop_path_rate=0.0,
                deterministic=self.deterministic)(h)
            h = film(h, f"film_out_{i}")
            h = ConvBlock(chans, k)(h) + res
            res = h

        out_mult = 2 if self.learn_sigma else 1
        h = ConvBlock(in_chans * out_mult, k, name="final_layer")(h)
        h = crop_time(h, pad)

        parts = jnp.split(h, 2 * out_mult, axis=-1)
        if self.learn_sigma:
            comp = jnp.concatenate([
                jax.lax.complex(parts[0], parts[1]),
                jax.lax.complex(parts[2], parts[3])], axis=-1)
        else:
            comp = jax.lax.complex(parts[0], parts[1])
        return to_solver_layout(comp)
