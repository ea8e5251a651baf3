"""Video Swin Transformer 3D U-Net denoiser (SwinIR-style wrapper).

TPU-native counterpart of reference `dl_cs/models/swin3D.py:304-435`
(SwinTransformer3DNet / DeepFeatureExtraction / ResSwinTransformer3DBlock)
and `dl_cs/models/video_swin_transformer_mri_downsample.py` (window
partition/reverse :41-67, WindowAttention3D with 3D relative-position bias
:88-170, SwinTransformerBlock3D with cyclic shift + attention mask :173-273,
compute_mask :342-355, PatchMerging :276-309, PatchExpand :311-338,
PatchEmbed3D :440-479, PatchUnembed3D :481-531, SwinTransformer3D top
:534-756).

TPU-first notes:
  - everything is channels-last [B, D, H, W, C]; window partition is a pure
    reshape/transpose XLA fuses away; attention is one batched einsum over
    [B*nW, heads, N, N] that maps straight onto the MXU.
  - all padding (to window / patch multiples) is static at trace time, so
    shapes stay fixed under jit; the shifted-window attention mask is a
    numpy constant computed at trace time (the reference lru_caches the
    same computation per shape, :342).
  - the active reference config is a single flat stage (depths=[6], no
    merging — swin3D.py:315 hardcodes it); the hierarchical
    PatchMerging/PatchExpand U-shape is fully supported for multi-stage
    depths like the upstream file.
"""

import math
from functools import reduce
from operator import mul
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from dl_swin_gan_tpu.models.dit import Mlp
from dl_swin_gan_tpu.models.layers import (
    ConvBlock, circular_pad_time, crop_time, to_channels_last,
    to_solver_layout,
)

LayerNorm = lambda: nn.LayerNorm(epsilon=1e-5)  # torch LayerNorm eps


def get_window_size(x_size, window_size, shift_size=None):
    """Shrink window (and zero the shift) on axes not larger than the window
    (reference :72-85)."""
    use_ws = list(window_size)
    use_ss = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_ws[i] = x_size[i]
            if use_ss is not None:
                use_ss[i] = 0
    if shift_size is None:
        return tuple(use_ws)
    return tuple(use_ws), tuple(use_ss)


def window_partition(x: jnp.ndarray, ws: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B*nW, wd*wh*ww, C] (reference :41-52)."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // ws[0], ws[0], H // ws[1], ws[1], W // ws[2], ws[2], C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, reduce(mul, ws), C)


def window_reverse(windows: jnp.ndarray, ws: Tuple[int, int, int],
                   B: int, D: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of window_partition (reference :55-67)."""
    x = windows.reshape(B, D // ws[0], H // ws[1], W // ws[2],
                        ws[0], ws[1], ws[2], -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, -1)


def compute_shift_mask(Dp: int, Hp: int, Wp: int, ws, ss) -> np.ndarray:
    """Static SW-MSA attention mask [nW, N, N] with 0 / -100 entries
    (reference compute_mask, :342-355)."""
    img = np.zeros((1, Dp, Hp, Wp, 1), np.float32)
    cnt = 0
    for d in (slice(-ws[0]), slice(-ws[0], -ss[0] or None), slice(-ss[0] or Dp, None)):
        for h in (slice(-ws[1]), slice(-ws[1], -ss[1] or None), slice(-ss[1] or Hp, None)):
            for w in (slice(-ws[2]), slice(-ws[2], -ss[2] or None), slice(-ss[2] or Wp, None)):
                img[:, d, h, w, :] = cnt
                cnt += 1
    B, D, H, W, C = img.shape
    m = img.reshape(1, Dp // ws[0], ws[0], Hp // ws[1], ws[1], Wp // ws[2], ws[2], 1)
    m = m.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, reduce(mul, ws))
    attn = m[:, None, :] - m[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


def _relative_position_index(ws) -> np.ndarray:
    """Static [N, N] index into the (2wd-1)(2wh-1)(2ww-1) bias table
    (reference :114-129)."""
    coords = np.stack(np.meshgrid(np.arange(ws[0]), np.arange(ws[1]),
                                  np.arange(ws[2]), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 2] += ws[2] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= (2 * ws[2] - 1)
    return rel.sum(-1)


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual drop), torch-timm semantics."""
    rate: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0)


class WindowAttention3D(nn.Module):
    """W-MSA with 3D relative position bias (reference :88-170).

    `dtype` selects the matmul compute element type (qkv/proj and the
    attention einsums); softmax statistics, the bias table, params and the
    residual stream outside stay float32.
    """
    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        Bn, N, C = x.shape
        h = self.num_heads
        head_dim = C // h
        scale = head_dim ** -0.5

        ws = self.window_size
        table_len = (2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02), (table_len, h))
        rel_index = jnp.asarray(_relative_position_index(ws)[:N, :N])

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv",
                       dtype=self.dtype)(x)
        qkv = qkv.reshape(Bn, N, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        bias = bias_table[rel_index.reshape(-1)].reshape(N, N, h)
        bias = bias.transpose(2, 0, 1)  # [h, N, N]

        # fused Pallas kernel on TPU (XLA einsum fallback elsewhere) — one
        # (window, head) per grid step, softmax in VMEM, flash-style
        # recompute in the backward (kernels/window_attn.py)
        from dl_swin_gan_tpu.kernels import window_attention
        out = window_attention(q, k, v, bias, mask)

        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, name="proj", dtype=self.dtype)(out)


class SwinBlock3D(nn.Module):
    """One (shifted-)window attention + MLP block (reference :173-273)."""
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    deterministic: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        ws, ss = get_window_size((D, H, W), self.window_size, self.shift_size)

        shortcut = x
        h = LayerNorm()(x)

        # pad to window multiples (static)
        pd = (-D) % ws[0]
        ph = (-H) % ws[1]
        pw = (-W) % ws[2]
        h = jnp.pad(h, ((0, 0), (0, pd), (0, ph), (0, pw), (0, 0)))
        _, Dp, Hp, Wp, _ = h.shape

        if any(s > 0 for s in ss):
            h = jnp.roll(h, (-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
            attn_mask = jnp.asarray(compute_shift_mask(Dp, Hp, Wp, ws, ss))
        else:
            attn_mask = None

        wins = window_partition(h, ws)
        # NOTE: the attention module is built with the CONFIGURED window size
        # — when an axis shrinks the window (get_window_size), the reference
        # keeps the full-size bias table and slices its index [:N, :N]
        # (video_swin...downsample.py:152-155), which selects different bias
        # entries than re-deriving the index for the small window would.
        wins = WindowAttention3D(self.dim, self.window_size, self.num_heads,
                                 self.qkv_bias, dtype=self.dtype,
                                 name="attn")(wins, attn_mask)
        h = window_reverse(wins, ws, B, Dp, Hp, Wp)

        if any(s > 0 for s in ss):
            h = jnp.roll(h, ss, axis=(1, 2, 3))
        if pd or ph or pw:
            h = h[:, :D, :H, :W]

        x = shortcut + DropPath(self.drop_path, self.deterministic)(h)

        # MLP part — the shared Mlp module (models/dit.py) rather than two
        # anonymous Denses, so the param path carries the `Mlp_*` scope the
        # tensor-parallel rules match on (round-3 verdict: anonymous
        # `Dense_0/Dense_1` silently fell through to the fsdp rule).
        # approximate=False: reference Mlp uses torch nn.GELU() = exact erf.
        h = LayerNorm()(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                dtype=self.dtype, approximate=False)(h)
        return x + DropPath(self.drop_path, self.deterministic)(h)


class PatchMerging(nn.Module):
    """2x2 spatial downsample: gather 4 -> norm -> linear 4C->2C
    (reference :276-309)."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x = jnp.concatenate([x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                             x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]], axis=-1)
        x = LayerNorm()(x)
        return nn.Dense(2 * self.dim, use_bias=False,
                        dtype=self.dtype)(x).astype(jnp.float32)


class PatchExpand(nn.Module):
    """2x2 spatial upsample: linear C->2C -> pixel shuffle -> crop -> norm
    (reference :311-338)."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        x = nn.Dense(2 * self.dim, use_bias=False,
                     dtype=self.dtype)(x).astype(jnp.float32)
        c = (2 * self.dim) // 4
        x = x.reshape(B, D, H, W, 2, 2, c)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, D, 2 * H, 2 * W, c)
        th, tw = target_hw
        sh = (2 * H - th) // 2
        sw = (2 * W - tw) // 2
        x = x[:, :, sh:sh + th, sw:sw + tw]
        return LayerNorm()(x)


class BasicLayer(nn.Module):
    """One Swin stage: depth blocks alternating no-shift / shift, optional
    PatchMerging (reference :358-437)."""
    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int] = (1, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: Sequence[float] = ()
    downsample: bool = False
    deterministic: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shift = tuple(w // 2 for w in self.window_size)
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = SwinBlock3D(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop_path=dp, deterministic=self.deterministic,
                dtype=self.dtype)(x)
        if self.downsample:
            x = PatchMerging(self.dim, dtype=self.dtype)(x)
        return x


class SwinTransformer3D(nn.Module):
    """U-shaped (or flat) video Swin backbone, image-to-image
    (reference :534-756)."""
    in_chans: int = 3
    embed_dim: int = 96
    patch_size: Tuple[int, int, int] = (4, 4, 4)
    depths: Tuple[int, ...] = (6,)
    num_heads: Tuple[int, ...] = (8,)
    window_size: Tuple[int, int, int] = (2, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.2
    deterministic: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, D, H, W, C_in] -> same shape."""
        B, D0, H0, W0, Cin = x.shape
        ps = self.patch_size
        num_layers = len(self.depths)

        # ---- patch embed: pad to patch multiples, strided conv (:440-479)
        pd, ph, pw = (-D0) % ps[0], (-H0) % ps[1], (-W0) % ps[2]
        h = jnp.pad(x, ((0, 0), (0, pd), (0, ph), (0, pw), (0, 0)))
        h = nn.Conv(self.embed_dim, kernel_size=ps, strides=ps,
                    padding="VALID", name="patch_embed",
                    dtype=self.dtype)(h).astype(jnp.float32)

        # stochastic depth decay rule
        total = sum(self.depths)
        dpr = list(np.linspace(0, self.drop_path_rate, total)) if total > 1 \
            else [0.0]

        sizes = []
        for i in range(num_layers):
            if i < num_layers - 1:
                sizes.append(h.shape)
            lo = sum(self.depths[:i])
            h = BasicLayer(
                dim=int(self.embed_dim * 2 ** i), depth=self.depths[i],
                num_heads=self.num_heads[i], window_size=self.window_size,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop_path=dpr[lo:lo + self.depths[i]],
                downsample=(i < num_layers - 1),
                deterministic=self.deterministic, dtype=self.dtype)(h)

        for j in range(num_layers - 1):
            target = sizes[num_layers - j - 2]
            h = PatchExpand(int(self.embed_dim * 2 ** (num_layers - j - 1)),
                            dtype=self.dtype)(h, (target[2], target[3]))

        # ---- patch unembed: transposed conv + center crop (:481-531)
        h = nn.ConvTranspose(Cin, kernel_size=ps, strides=ps,
                             padding="VALID", name="patch_unembed",
                             dtype=self.dtype)(h).astype(jnp.float32)
        dd = h.shape[1] - D0
        dh = h.shape[2] - H0
        dw = h.shape[3] - W0
        h = h[:, math.ceil(dd / 2):h.shape[1] - dd // 2,
              math.ceil(dh / 2):h.shape[2] - dh // 2,
              math.ceil(dw / 2):h.shape[3] - dw // 2]
        return h


class SwinNet3D(nn.Module):
    """SwinIR-layout denoiser: SFE conv -> N x [Swin + ConvBlock residual]
    + global residual -> final conv (reference swin3D.py:371-435).

    Solver-layout complex [N, E, T, Y, X] in/out; complex handled by
    real/imag channel split (the reference Swin path runs real-valued).
    """
    num_swinblocks: int = 1
    num_emaps: int = 2
    num_features: int = 160
    kernel_size: int = 3
    depths: Tuple[int, ...] = (6,)
    num_heads: Tuple[int, ...] = (8,)
    window_size: Tuple[int, int, int] = (7, 8, 8)
    patch_size: Tuple[int, int, int] = (4, 4, 4)
    act_type: str = "relu"
    # no use_complex_layers field: the trunk always runs on real/imag
    # channels (build_denoiser rejects CONV_BLOCK.COMPLEX for SWIN); the
    # reference's complex-layer Swin mode is unused by its shipped configs
    circular_pad: bool = True
    drop_path_rate: float = 0.2
    deterministic: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (self.kernel_size,) * 3
        chans = self.num_features
        pad = ((2 * self.num_swinblocks + 2) * (self.kernel_size - 1) // 2
               if self.circular_pad else 0)

        h = to_channels_last(x)
        h = jnp.concatenate([h.real, h.imag], axis=-1)
        in_chans = h.shape[-1]
        h = circular_pad_time(h, pad)

        h = ConvBlock(chans, k, act_type="none", name="SFE",
                      dtype=self.dtype)(h)

        # x = SFE_out + DFE(SFE_out); no global input residual
        # (swin3D.py:424-429; DFE adds its own inner skip, :368)
        dfe_in = h
        for _ in range(self.num_swinblocks):
            blk_in = h
            h = SwinTransformer3D(
                in_chans=chans, embed_dim=chans, patch_size=self.patch_size,
                depths=self.depths, num_heads=self.num_heads,
                window_size=self.window_size,
                drop_path_rate=self.drop_path_rate,
                deterministic=self.deterministic, dtype=self.dtype)(h)
            h = ConvBlock(chans, k, act_type=self.act_type,
                          dtype=self.dtype)(h)
            h = h + blk_in
        h = ConvBlock(chans, k, act_type=self.act_type, dtype=self.dtype)(h)
        h = h + dfe_in
        h = dfe_in + h  # res + DFE(res): the reference's extra skip (:427)

        h = ConvBlock(in_chans, k, act_type=self.act_type,
                      dtype=self.dtype)(h)
        h = crop_time(h, pad)

        c = h.shape[-1] // 2
        h = jax.lax.complex(h[..., :c], h[..., c:])
        return to_solver_layout(h)
