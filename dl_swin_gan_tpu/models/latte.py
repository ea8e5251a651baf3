"""Latte video diffusion transformer.

TPU-native counterpart of reference `dl_cs/models/Latte.py`: per-frame 2D
patch embedding (:89-148), sin-cos spatial + temporal embeddings (:149-192),
serial INTERLEAVED spatial/temporal adaLN-Zero transformer blocks — even
blocks attend over space within a frame, odd blocks over time per patch
trajectory, with the temporal embedding added after the first spatial block
(:508-546) — zero-init FinalLayer, unpatchify2 with end-pad/center-crop
quirk, CFG forward (:562-581), and the LatteNet wrapper (:861-937; note the
reference defines an SFE conv but never calls it — Latte consumes the 2E
real channels directly, kept faithful here).
"""

import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from dl_swin_gan_tpu.models.dit import (
    Attention, FinalLayer, LabelEmbedder, Mlp, TimestepEmbedder, _ln,
    _sincos_1d, modulate, pos_embed_2d,
)
from dl_swin_gan_tpu.models.layers import (
    circular_pad_time, crop_time, to_channels_last, to_solver_layout,
)


class TransformerBlock(nn.Module):
    """Standard adaLN-Zero block (reference Latte.py:294-320)."""
    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(6 * self.hidden_size,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="adaLN_modulation")(nn.silu(c))
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=1)
        x = x + g_a[:, None] * Attention(self.hidden_size, self.num_heads,
                                         name="attn", dtype=self.dtype)(
            modulate(_ln(x), sh_a, sc_a))
        x = x + g_m[:, None] * Mlp(int(self.hidden_size * self.mlp_ratio),
                                   self.hidden_size, dtype=self.dtype)(
            modulate(_ln(x), sh_m, sc_m))
        return x


class Latte(nn.Module):
    """Latte over [N, F, H, W, C] volumes (reference :338-581).

    depth counts TOTAL blocks; they are consumed in (spatial, temporal)
    pairs, so depth should be even (reference iterates blocks[i:i+2]).
    """
    in_channels: int = 4
    hidden_size: int = 192
    patch_size: int = 4
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    num_classes: int = 1
    class_dropout_prob: float = 0.1
    extras: int = 1              # 1: t only; 2: t + class label
    learn_sigma: bool = False
    deterministic: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, y=None):
        N, F, H, W, C = x.shape
        p = self.patch_size
        out_c = self.in_channels * 2 if self.learn_sigma else self.in_channels

        padH, padW = (-H) % p, (-W) % p
        h = jnp.pad(x, ((0, 0), (0, 0), (0, padH), (0, padW), (0, 0)))
        Gh, Gw = (H + padH) // p, (W + padW) // p

        # per-frame 2D patch embed: fold frames into batch
        h = h.reshape(N * F, H + padH, W + padW, C)
        h = nn.Conv(self.hidden_size, kernel_size=(p, p), strides=(p, p),
                    padding="VALID",
                    kernel_init=nn.initializers.xavier_uniform(),
                    name="x_embedder", dtype=self.dtype)(h)
        tokens = h.reshape(N * F, Gh * Gw, self.hidden_size)
        n_sp = Gh * Gw

        # f32 pos-embed add keeps the residual stream float32 under bf16
        pos = jnp.asarray(pos_embed_2d(self.hidden_size, (Gh, Gw)))[None]
        tokens = tokens + pos
        temp_embed = jnp.asarray(
            _sincos_1d(self.hidden_size, np.arange(F, dtype=np.float64))
        ).astype(jnp.float32)[None]  # [1, F, D]

        temb = TimestepEmbedder(self.hidden_size, name="t_embedder")(t)  # [N, D]
        ts_spatial = jnp.repeat(temb, F, axis=0)       # [(N F), D]
        ts_temporal = jnp.repeat(temb, n_sp, axis=0)   # [(N n_sp), D]

        if self.extras == 2:
            yemb = LabelEmbedder(self.num_classes, self.hidden_size,
                                 self.class_dropout_prob,
                                 deterministic=self.deterministic,
                                 name="y_embedder")(y)
            y_spatial = jnp.repeat(yemb, F, axis=0)
            y_temporal = jnp.repeat(yemb, n_sp, axis=0)

        for i in range(0, self.depth, 2):
            c = ts_spatial + (y_spatial if self.extras == 2 else 0.0)
            tokens = TransformerBlock(self.hidden_size, self.num_heads,
                                      self.mlp_ratio,
                                      dtype=self.dtype)(tokens, c)

            # -> temporal grouping [(N n_sp), F, D]
            tokens = tokens.reshape(N, F, n_sp, self.hidden_size)
            tokens = tokens.transpose(0, 2, 1, 3).reshape(
                N * n_sp, F, self.hidden_size)
            if i == 0:
                tokens = tokens + temp_embed

            c = ts_temporal + (y_temporal if self.extras == 2 else 0.0)
            tokens = TransformerBlock(self.hidden_size, self.num_heads,
                                      self.mlp_ratio,
                                      dtype=self.dtype)(tokens, c)

            # -> back to spatial grouping [(N F), n_sp, D]
            tokens = tokens.reshape(N, n_sp, F, self.hidden_size)
            tokens = tokens.transpose(0, 2, 1, 3).reshape(
                N * F, n_sp, self.hidden_size)

        c = ts_spatial + (y_spatial if self.extras == 2 else 0.0)
        tokens = FinalLayer(self.hidden_size, p * p, out_c,
                            name="final_layer", dtype=self.dtype)(tokens, c)

        # unpatchify2 (2D) + center-crop-of-end-padding quirk (:450-473)
        h = tokens.reshape(N * F, Gh, Gw, p, p, out_c)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(
            N * F, Gh * p, Gw * p, out_c)
        h = h[:, math.ceil(padH / 2):(H + padH) - padH // 2,
              math.ceil(padW / 2):(W + padW) - padW // 2]
        return h.reshape(N, F, H, W, out_c)

    def forward_with_cfg(self, variables, x, t, y, cfg_scale: float):
        """Reference :562-581 (guides the first 4 channels)."""
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = self.apply(variables, combined, t, y)
        eps, rest = out[..., :4], out[..., 4:]
        cond, uncond = jnp.split(eps, 2, axis=0)
        guided = uncond + cfg_scale * (cond - uncond)
        eps = jnp.concatenate([guided, guided], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)


class LatteNet(nn.Module):
    """Wrapper used by the unrolled diffusion solvers (reference :861-937).

    The reference defines an SFE conv but its forward skips it — Latte runs
    directly on the 2E real/imag channels. Kept faithful.
    """
    num_emaps: int = 2
    hidden_size: int = 192
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 4
    num_blocks: int = 2          # circular pad extent only
    kernel_size: int = 3
    circular_pad: bool = True
    learn_sigma: bool = False
    num_classes: int = 1
    deterministic: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, y):
        pad = ((2 * self.num_blocks + 2) * (self.kernel_size - 1) // 2
               if self.circular_pad else 0)

        h = to_channels_last(x)
        h = jnp.concatenate([h.real, h.imag], axis=-1)
        in_chans = h.shape[-1]
        h = circular_pad_time(h, pad)

        h = Latte(in_channels=in_chans, hidden_size=self.hidden_size,
                  patch_size=self.patch_size, depth=self.depth,
                  num_heads=self.num_heads, learn_sigma=self.learn_sigma,
                  num_classes=self.num_classes,
                  deterministic=self.deterministic, name="Latte",
                  dtype=self.dtype)(h, t, y)
        h = crop_time(h, pad)

        out_mult = 2 if self.learn_sigma else 1
        parts = jnp.split(h, 2 * out_mult, axis=-1)
        if self.learn_sigma:
            comp = jnp.concatenate([
                jax.lax.complex(parts[0], parts[1]),
                jax.lax.complex(parts[2], parts[3])], axis=-1)
        else:
            comp = jax.lax.complex(parts[0], parts[1])
        return to_solver_layout(comp)


# ---------------------------------------------------------------- presets
# Size presets mirroring reference Latte.py:647-682.

def Latte_XL(**kw): return Latte(depth=28, hidden_size=1152, num_heads=16, **kw)
def Latte_L(**kw):  return Latte(depth=24, hidden_size=1024, num_heads=16, **kw)
def Latte_B(**kw):  return Latte(depth=12, hidden_size=768, num_heads=12, **kw)
def Latte_S(**kw):  return Latte(depth=12, hidden_size=384, num_heads=6, **kw)

Latte_models = {"Latte-XL": Latte_XL, "Latte-L": Latte_L,
                "Latte-B": Latte_B, "Latte-S": Latte_S}
