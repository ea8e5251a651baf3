"""Diffusion Transformer (DiT) for 3D (t, y, x) volumes.

TPU-native counterpart of reference `dl_cs/models/DiT.py`: PatchEmbed3D with
padding bookkeeping (:78-138, calc_num_patch :30-53), factorized
spatial/temporal token grouping (:55-76), TimestepEmbedder (:184-221),
LabelEmbedder with CFG dropout (:224-251), trace-time 3D sin-cos positional
embedding (:253-305, helpers :675-789), DiTBlockFactor — adaLN-Zero with
9-way modulation and factorized attention (:311-350), plain DiTBlock
(:353-385), zero-init FinalLayer (:388-408), DiT top with unpatchify2 crop
(:411-632), CFG forward (:652-668), and the DiTResNet wrapper the unrolled
solvers instantiate (:1284-1351).

Faithfully-kept reference quirks:
  - DiTBlockFactor's second (spatial) attention re-uses the FIRST pair of
    shift/scale modulations but the temporal gate (reference :342 uses
    shift/scale_msa_spatial in both branches)
  - both factorized attentions share ONE attention module's weights (:319)
  - unpatchify2 center-crops even though patch padding was appended at the
    end (:539-541)

Layout: channels-last [N, F, H, W, C] internally; the wrapper converts from
solver-layout complex [N, E, T, Y, X].
"""

import math
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from dl_swin_gan_tpu.models.layers import (
    ConvBlock, circular_pad_time, crop_time, to_channels_last,
    to_solver_layout,
)


# ---------------------------------------------------------------- embeddings

def timestep_embedding(t: jnp.ndarray, dim: int, max_period=10000) -> jnp.ndarray:
    """Sinusoidal embeddings (reference :197-216)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    freq_size: int = 256

    @nn.compact
    def __call__(self, t):
        h = timestep_embedding(t, self.freq_size)
        h = nn.Dense(self.hidden_size,
                     kernel_init=nn.initializers.normal(0.02))(h)
        h = nn.silu(h)
        return nn.Dense(self.hidden_size,
                        kernel_init=nn.initializers.normal(0.02))(h)


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout (reference :224-251)."""
    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, labels, force_drop_ids=None):
        use_cfg = int(self.dropout_prob > 0)
        table = nn.Embed(self.num_classes + use_cfg, self.hidden_size,
                         embedding_init=nn.initializers.normal(0.02))
        if (not self.deterministic and self.dropout_prob > 0) \
                or force_drop_ids is not None:
            if force_drop_ids is None:
                rng = self.make_rng("dropout")
                drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            else:
                drop = force_drop_ids == 1
            labels = jnp.where(drop, self.num_classes, labels)
        return table(labels)


def _sincos_1d(dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def pos_embed_3d(dim: int, grid: Tuple[int, int, int],
                 max_grid: Tuple[int, int, int] = (128, 128, 15)) -> np.ndarray:
    """Bit-faithful twin of the reference PosEmbed lookup (DiT.py:253-306).

    The reference builds a sin-cos table over max_grid via an 'xy'-indexed
    np.meshgrid (which swaps the first two axes), then selects token
    (f, h, w) with flat index r = w + maxF*h + maxF*maxH*f — an indexing
    that does NOT invert the table layout. The per-token vectors are
    therefore scrambled-but-deterministic constants; training adapts to
    them, so weight-level parity requires replicating the scramble exactly.
    Computed here in closed form (no table): unraveling r over the
    table's (maxH, maxF, maxW) shape gives the three embedded values.

    Trace-time numpy constant; grids beyond max_grid (where the reference
    would index out of bounds) extend gracefully via the same formulas.
    """
    F, H, W = grid
    maxF, maxH, maxW = max_grid
    d = dim // 3
    d_even = d if d % 2 == 0 else d - 1
    ff, hh, ww = np.meshgrid(np.arange(F), np.arange(H), np.arange(W),
                             indexing="ij")
    r = (ww + maxF * hh + maxF * maxH * ff).reshape(-1)
    pos_t = (r // maxW) % maxF   # table grid_t value at the selected cell
    pos_w = r // (maxF * maxW)   # table grid_w value
    pos_h = r % maxW             # table grid_h value
    emb = np.concatenate([
        _sincos_1d(d_even, pos_t.astype(np.float64)),
        _sincos_1d(d_even, pos_w.astype(np.float64)),
        _sincos_1d(d_even, pos_h.astype(np.float64)),
    ], axis=1)
    if emb.shape[1] < dim:
        emb = np.concatenate(
            [emb, np.zeros((emb.shape[0], dim - emb.shape[1]))], axis=1)
    return emb.astype(np.float32)


def pos_embed_2d(dim: int, grid: Tuple[int, int]) -> np.ndarray:
    """Twin of Latte's PosEmbed lookup (Latte.py:475-508): the 'xy'-meshgrid
    table + `h + w*max_H` flat index work out (for W <= max grid 128) to
    embedding the COLUMN in the first dim/2 and the ROW in the second."""
    H, W = grid
    hh, ww = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    emb = np.concatenate([
        _sincos_1d(dim // 2, ww.astype(np.float64)),
        _sincos_1d(dim // 2, hh.astype(np.float64)),
    ], axis=1)
    return emb.astype(np.float32)


# ---------------------------------------------------------------- attention

class Attention(nn.Module):
    """Plain multi-head self-attention (timm-equivalent, qkv_bias=True).

    `dtype` selects the matmul compute element type (qkv/proj projections
    and both attention einsums run in it; softmax statistics stay float32;
    params stay float32). bfloat16 here feeds the MXU at its full issue
    rate — the residual stream outside this module stays float32.
    """
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        head = C // h
        qkv = nn.Dense(3 * C, name="qkv", dtype=self.dtype)(x)
        qkv = qkv.reshape(B, N, 3, h, head).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * head ** -0.5, qkv[1], qkv[2]
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(self.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="proj", dtype=self.dtype)(out)


def modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


def _ln(x):
    return nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False)(x)


class Mlp(nn.Module):
    """Transformer MLP (timm-Mlp counterpart). Shared by DiT, Latte and the
    Swin blocks so the tensor-parallel rules (`parallel/mesh.py::_TP_RULES`,
    matched on `Mlp_*/Dense_{0,1}`) cover every trunk by construction.
    `approximate=False` selects the exact erf GELU (torch nn.GELU default,
    what the Swin reference uses); DiT/Latte keep the tanh form."""
    hidden: int
    out: int
    dtype: Any = jnp.float32
    approximate: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=self.approximate)
        return nn.Dense(self.out, dtype=self.dtype)(x)


def factorize(x, grid, flag):
    """Reference :55-65. grid=(b, f, h, w); tokens arrive [b, f*h*w, d].
    flag=0: spatial groups (b*f, h*w, d); flag=1: temporal groups (b*h*w, f, d)."""
    b, f, h, w = grid
    d = x.shape[-1]
    if flag == 0:
        return x.reshape(b * f, h * w, d)
    x = x.reshape(b, f, h, w, d).transpose(0, 2, 3, 1, 4)
    return x.reshape(b * h * w, f, d)


def unfactorize(x, grid, flag):
    b, f, h, w = grid
    d = x.shape[-1]
    if flag == 0:
        return x.reshape(b, f * h * w, d)
    x = x.reshape(b, h, w, f, d).transpose(0, 3, 1, 2, 4)
    return x.reshape(b, f * h * w, d)


class DiTBlockFactor(nn.Module):
    """adaLN-Zero block with factorized temporal-then-spatial attention
    (reference :311-350, incl. its modulation quirk)."""
    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, grid):
        mod = nn.Dense(9 * self.hidden_size,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="adaLN_modulation")(nn.silu(c))
        (sh_sp, sc_sp, g_sp, sh_tm, sc_tm, g_tm,
         sh_mlp, sc_mlp, g_mlp) = jnp.split(mod, 9, axis=1)

        attn = Attention(self.hidden_size, self.num_heads, name="attn",
                         dtype=self.dtype)

        # first attention: over frames per spatial location (flag=1)
        resid = x
        h = modulate(_ln(x), sh_sp, sc_sp)
        h = unfactorize(attn(factorize(h, grid, 1)), grid, 1)
        x = g_sp[:, None] * h + resid

        # second attention: over pixels per frame (flag=0); the reference
        # reuses the *spatial* shift/scale here (:342) — kept verbatim
        resid = x
        h = modulate(_ln(x), sh_sp, sc_sp)
        h = unfactorize(attn(factorize(h, grid, 0)), grid, 0)
        x = g_tm[:, None] * h + resid

        h = Mlp(int(self.hidden_size * self.mlp_ratio), self.hidden_size,
                dtype=self.dtype)(modulate(_ln(x), sh_mlp, sc_mlp))
        return x + g_mlp[:, None] * h


class DiTBlock(nn.Module):
    """Plain (joint spatiotemporal) adaLN-Zero block (reference :353-385)."""
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


class FinalLayer(nn.Module):
    """Zero-initialized output projection (reference :388-408)."""
    hidden_size: int
    patch_vol: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(2 * self.hidden_size,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="adaLN_modulation")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=1)
        x = modulate(_ln(x), shift, scale)
        return nn.Dense(self.patch_vol * self.out_channels,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="linear",
                        dtype=self.dtype)(x).astype(jnp.float32)


# ---------------------------------------------------------------- DiT top

class DiT(nn.Module):
    """DiT over [N, F, H, W, C] feature volumes (reference :411-632)."""
    in_channels: int = 4
    hidden_size: int = 384
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    depth: int = 6
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_classes: int = 1
    class_dropout_prob: float = 0.1
    learn_sigma: bool = False
    factorized: bool = True
    deterministic: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, y):
        N, F, H, W, C = x.shape
        p0, p1, p2 = self.patch_size
        out_c = self.in_channels * 2 if self.learn_sigma else self.in_channels

        padF, padH, padW = (-F) % p0, (-H) % p1, (-W) % p2
        h = jnp.pad(x, ((0, 0), (0, padF), (0, padH), (0, padW), (0, 0)))
        Gf, Gh, Gw = (F + padF) // p0, (H + padH) // p1, (W + padW) // p2

        # patchify (xavier-init conv like the reference's re-init, :477-480)
        h = nn.Conv(self.hidden_size, kernel_size=(p0, p1, p2),
                    strides=(p0, p1, p2), padding="VALID",
                    kernel_init=nn.initializers.xavier_uniform(),
                    name="x_embedder", dtype=self.dtype)(h)
        tokens = h.reshape(N, Gf * Gh * Gw, self.hidden_size)
        # f32 pos-embed add keeps the residual stream float32 under bf16
        tokens = tokens + jnp.asarray(
            pos_embed_3d(self.hidden_size, (Gf, Gh, Gw)))[None]

        temb = TimestepEmbedder(self.hidden_size, name="t_embedder")(t)
        yemb = LabelEmbedder(self.num_classes, self.hidden_size,
                             self.class_dropout_prob,
                             deterministic=self.deterministic,
                             name="y_embedder")(y)
        c = temb + yemb

        grid = (N, Gf, Gh, Gw)
        for i in range(self.depth):
            if self.factorized:
                tokens = DiTBlockFactor(self.hidden_size, self.num_heads,
                                        self.mlp_ratio,
                                        dtype=self.dtype)(tokens, c, grid)
            else:
                tokens = DiTBlock(self.hidden_size, self.num_heads,
                                  self.mlp_ratio,
                                  dtype=self.dtype)(tokens, c)

        tokens = FinalLayer(self.hidden_size, p0 * p1 * p2, out_c,
                            name="final_layer", dtype=self.dtype)(tokens, c)

        # unpatchify2 (reference :515-543) — channels-last variant
        h = tokens.reshape(N, Gf, Gh, Gw, p0, p1, p2, out_c)
        h = h.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        h = h.reshape(N, Gf * p0, Gh * p1, Gw * p2, out_c)
        # center-crop away the (end-appended) padding — reference quirk
        h = h[:, math.ceil(padF / 2):(F + padF) - padF // 2,
              math.ceil(padH / 2):(H + padH) - padH // 2,
              math.ceil(padW / 2):(W + padW) - padW // 2]
        return h

    def forward_with_cfg(self, variables, x, t, y, cfg_scale: float):
        """Classifier-free guidance (reference :652-668): caller passes a
        doubled batch [cond; uncond].

        Deliberate divergence: the reference guides a hardcoded 3 channels
        (DiT.py:665 `eps = model_out[:, :3]`, an image-DiT leftover — MRI
        volumes here carry 2*num_emaps channels); this guides all
        in_channels. The Latte twin keeps its analogous :4 quirk because
        its channel count actually is 4."""
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = self.apply(variables, combined, t, y)
        eps, rest = out[..., :self.in_channels], out[..., self.in_channels:]
        cond, uncond = jnp.split(eps, 2, axis=0)
        guided = uncond + cfg_scale * (cond - uncond)
        eps = jnp.concatenate([guided, guided], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)


class DiTResNet(nn.Module):
    """SFE conv -> DiT -> final conv on (x + res) (reference :1284-1351).

    Solver-layout complex [N, E, T, Y, X] in/out; conditioned on (t, y).
    """
    num_emaps: int = 2
    hidden_size: int = 384
    depth: int = 6
    num_heads: int = 16
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    num_blocks: int = 2          # only sets the circular pad extent
    kernel_size: int = 3
    act_type: str = "relu"
    circular_pad: bool = True
    learn_sigma: bool = False
    num_classes: int = 1
    deterministic: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, y):
        k = (self.kernel_size,) * 3
        pad = ((2 * self.num_blocks + 2) * (self.kernel_size - 1) // 2
               if self.circular_pad else 0)

        h = to_channels_last(x)                  # [N, T, Y, X, E] complex
        h = jnp.concatenate([h.real, h.imag], axis=-1)
        in_chans = h.shape[-1]
        h = circular_pad_time(h, pad)

        res = ConvBlock(self.hidden_size, k, act_type="none", name="SFE",
                        dtype=self.dtype)(h)
        h = DiT(in_channels=self.hidden_size, hidden_size=self.hidden_size,
                patch_size=self.patch_size, depth=self.depth,
                num_heads=self.num_heads, learn_sigma=self.learn_sigma,
                num_classes=self.num_classes,
                deterministic=self.deterministic, name="DiT",
                dtype=self.dtype)(res, t, y)

        out_mult = 2 if self.learn_sigma else 1
        if self.learn_sigma:
            # the reference's learn_sigma path through DiTResNet is broken
            # (final conv shape mismatch); here mean channels go through the
            # residual+conv path and variance channels through their own conv
            mean, var = jnp.split(h, 2, axis=-1)
            mean = ConvBlock(in_chans, k, act_type=self.act_type,
                             name="final_layer", dtype=self.dtype)(mean + res)
            var = ConvBlock(in_chans, k, act_type=self.act_type,
                            name="var_layer", dtype=self.dtype)(var)
            h = jnp.concatenate([mean, var], axis=-1)
        else:
            h = ConvBlock(in_chans, k, act_type=self.act_type,
                          name="final_layer", dtype=self.dtype)(h + res)
        h = crop_time(h, pad)

        c = h.shape[-1] // (2 * out_mult)
        parts = jnp.split(h, 2 * out_mult, axis=-1)
        if self.learn_sigma:
            comp = jnp.concatenate([
                jax.lax.complex(parts[0], parts[1]),
                jax.lax.complex(parts[2], parts[3])], axis=-1)
        else:
            comp = jax.lax.complex(parts[0], parts[1])
        return to_solver_layout(comp)


# ---------------------------------------------------------------- presets
# Size presets mirroring reference DiT.py:796-841.

def DiT_XL(**kw): return DiT(depth=28, hidden_size=1152, num_heads=16, **kw)
def DiT_L(**kw):  return DiT(depth=24, hidden_size=1024, num_heads=16, **kw)
def DiT_B(**kw):  return DiT(depth=12, hidden_size=768, num_heads=12, **kw)
def DiT_S(**kw):  return DiT(depth=12, hidden_size=384, num_heads=6, **kw)

DiT_models = {"DiT-XL": DiT_XL, "DiT-L": DiT_L, "DiT-B": DiT_B, "DiT-S": DiT_S}
