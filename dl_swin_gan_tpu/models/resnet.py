"""3D ResNet denoiser family (plain / squeeze-excitation / CBAM).

TPU-native counterpart of reference `dl_cs/models/resnet3d.py:243-317`
(ResNet), `se3d.py:300-514` (SeBlock/SeResBlock/SeResNet) and
`CBAM.py:394-521` (CABlock/SABlock/CBAMResBlock) — the reference's three
structurally identical trunks collapse into one `GatedResNet3D` with a
`gate` switch. Semantics preserved:

  - pre-activation conv blocks, complex convs optional, channel count
    scaled 1/sqrt(2) for complex nets (resnet3d.py:257)
  - circular padding through time + center-crop undo (resnet3d.py:277-287)
  - global residual around the whole stack (resnet3d.py:312)
  - SE gate: GAP -> FC(C->rr) -> ReLU -> FC(rr->C) -> sigmoid, the same
    real FC applied to re/im separately, gate multiplies the block output
    before the residual add (se3d.py:300-438). rr is an absolute hidden
    width, not a divisor (se3d.py:324-326).
  - CBAM: channel attention (avg-pool path only; the max-pool path is
    commented out upstream, CBAM.py:411-422) then spatial attention
    (channel-mean -> k=5 conv, NO sigmoid — faithful to CBAM.py:459-475),
    then residual.

The module maps solver-layout complex images [N, E, T, Y, X] to themselves;
internally it runs channels-last [N, T, Y, X, C].
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dl_swin_gan_tpu.models.layers import (
    ComplexConv, Conv, ConvBlock, activation, circular_pad_time, crop_time,
    to_channels_last, to_solver_layout, torch_bias_init, torch_kernel_init,
)


def _split_apply(fn, x):
    """Apply a real-valued fn separately to re/im of a complex array."""
    if jnp.iscomplexobj(x):
        return jax.lax.complex(fn(x.real), fn(x.imag))
    return fn(x)


class ChannelGate(nn.Module):
    """SE / CBAM-CA channel gate: GAP -> FC -> ReLU -> FC -> sigmoid."""
    reduction: int

    @nn.compact
    def __call__(self, x):
        # x channels-last [N, *spatial, C] -> pooled [N, C]
        pooled = x.mean(axis=tuple(range(1, x.ndim - 1)))
        # torch nn.Linear default init (the reference's SeBlock FCs)
        C = x.shape[-1]
        fc1 = nn.Dense(self.reduction, kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(C))
        fc2 = nn.Dense(C, kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(self.reduction))
        g = _split_apply(fc1, pooled)
        g = _split_apply(jax.nn.relu, g)
        g = _split_apply(fc2, g)
        g = _split_apply(jax.nn.sigmoid, g)
        return g.reshape((g.shape[0],) + (1,) * (x.ndim - 2) + (g.shape[-1],))


class SpatialGate(nn.Module):
    """CBAM-SA: channel-mean -> k=5 conv -> multiply (no sigmoid upstream)."""
    is_complex: bool
    ndim: int = 3

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=-1, keepdims=True)  # [N, *spatial, 1]
        conv = ComplexConv if self.is_complex else Conv
        return conv(1, (5,) * self.ndim)(s)


class GatedResBlock(nn.Module):
    """Two ConvBlocks, optional channel/spatial gates, residual add."""
    features: int
    kernel_size: int
    act_type: str
    is_complex: bool
    gate: str          # none | se | cbam
    reduction: int
    ndim: int = 3
    dtype: Any = jnp.float32
    separable: bool = False

    @nn.compact
    def __call__(self, x):
        k = (self.kernel_size,) * self.ndim
        h = ConvBlock(self.features, k, self.act_type,
                      is_complex=self.is_complex, dtype=self.dtype,
                      separable=self.separable)(x)
        h = ConvBlock(self.features, k, self.act_type,
                      is_complex=self.is_complex, dtype=self.dtype,
                      separable=self.separable)(h)
        if self.gate in ("se", "cbam"):
            h = h * ChannelGate(self.reduction)(h)
        if self.gate == "cbam":
            h = h * SpatialGate(self.is_complex, self.ndim)(h)
        # reference quirk: nn.ReLU(inplace=True) inside the pre-activation
        # ConvBlock MUTATES the block input before the skip add, so the
        # real-conv path residual is act(x), not x (resnet3d.py:45 + :240).
        # The complex path is unaffected because Activation splits re/im
        # into fresh tensors (resnet3d.py:52-53). Verified by weight-level
        # forward parity (tests/test_forward_parity.py).
        resid = x if self.is_complex else activation(x, self.act_type)
        return h + resid


class GatedResNet3D(nn.Module):
    """N-D gated ResNet trunk; ndim=3 is the cine denoiser, ndim=2/1 serve
    the DSLR spatial/temporal nets (reference resnet2d.py / resnet1d.py are
    structural clones of resnet3d.py). Circular padding applies to the first
    spatial axis (time for 3D/1D, H for 2D — matching the reference's pad of
    dim 2)."""
    num_resblocks: int = 2
    num_emaps: int = 2
    num_features: int = 64
    kernel_size: int = 3
    act_type: str = "relu"
    use_complex_layers: bool = True
    circular_pad: bool = True
    gate: str = "none"
    reduction: int = 16
    ndim: int = 3
    dtype: Any = jnp.float32
    separable: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (self.kernel_size,) * self.ndim
        chans = (int(self.num_features / 1.4142) + 1
                 if self.use_complex_layers else self.num_features)
        pad = ((2 * self.num_resblocks + 2) * (self.kernel_size - 1) // 2
               if self.circular_pad else 0)

        h = to_channels_last(x)  # [N, T, Y, X, E] complex
        if not self.use_complex_layers:
            h = jnp.concatenate([h.real, h.imag], axis=-1)
        in_chans = h.shape[-1]

        h = circular_pad_time(h, pad)
        resid = h
        sep = self.separable and self.ndim == 3
        h = ConvBlock(chans, k, act_type="none",
                      is_complex=self.use_complex_layers, dtype=self.dtype,
                      separable=sep)(h)
        for _ in range(self.num_resblocks):
            h = GatedResBlock(chans, self.kernel_size, self.act_type,
                              self.use_complex_layers, self.gate,
                              self.reduction, self.ndim, self.dtype, sep)(h)
        h = ConvBlock(in_chans, k, act_type=self.act_type,
                      is_complex=self.use_complex_layers, dtype=self.dtype,
                      separable=sep)(h)
        h = h + resid
        h = crop_time(h, pad)

        if not self.use_complex_layers:
            c = h.shape[-1] // 2
            h = jax.lax.complex(h[..., :c], h[..., c:])
        return to_solver_layout(h)


class ResNet3D(GatedResNet3D):
    """Plain 3D ResNet (reference resnet3d.py)."""
    gate: str = "none"


class ResNet2D(GatedResNet3D):
    """Plain 2D ResNet for DSLR spatial basis (reference resnet2d.py)."""
    gate: str = "none"
    ndim: int = 2


class ResNet1D(GatedResNet3D):
    """Plain 1D ResNet for DSLR temporal basis (reference resnet1d.py)."""
    gate: str = "none"
    ndim: int = 1
