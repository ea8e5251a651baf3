"""Shared conv layers (flax.linen, channels-last NTYXC layout).

TPU-native counterpart of reference `dl_cs/models/resnet3d.py:12-240`
(Normalization/Activation/Conv3d/ComplexConv3d/ConvBlock). One
implementation serves the 1D/2D/3D variants the reference duplicates across
resnet{1,2,3}d.py.

Layout: solvers hold images as [N, E, T, Y, X] complex64 (FFT-friendly);
denoisers run channels-last [N, T, Y, X, C] (conv-friendly). Complex
convolution is realized as ONE real convolution on stacked real/imag
features with a block-structured kernel [[X, Y], [-Y, X]] — mathematically
identical to the reference's two-conv expansion (resnet3d.py:92-106) but a
single large MXU op instead of four small ones.
"""

import os
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def _conv3d_tapc(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat variant of the temporal-tap lowering (same math).

    Stacks the kt time-shifted views along channels and runs ONE 2D conv
    with a [ky, kx, kt*Cin, Cout] kernel — a single large MXU contraction
    per layer instead of kt smaller ones, at kt-times the input HBM
    materialization. Select with DL_SWIN_GAN_CONV3D=tapc.

    x: [N, T, Y, X, Cin] channels-last; kernel: [kt, ky, kx, Cin, Cout].
    """
    kt, n, t = kernel.shape[0], x.shape[0], x.shape[1]
    cin = kernel.shape[3]
    pad = kt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    taps = [jax.lax.dynamic_slice_in_dim(xp, dt, t, axis=1)
            for dt in range(kt)]
    cat = jnp.concatenate(taps, axis=-1).reshape(
        (n * t,) + x.shape[2:4] + (kt * cin,))
    # input-channel index dt*cin + c must pick kernel[dt, ..., c, :]
    wk = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(
        kernel.shape[1:3] + (kt * cin, kernel.shape[4]))
    dn = jax.lax.conv_dimension_numbers(
        cat.shape, wk.shape, ("NYXC", "YXIO", "NYXC"))
    out = jax.lax.conv_general_dilated(cat, wk, (1, 1), "SAME",
                                       dimension_numbers=dn)
    return out.reshape((n, t) + out.shape[1:])


def _conv3d_tap(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Exact temporal-tap formulation of a SAME 3D conv (no bias).

    conv3d(x, k)[t] == sum_dt conv2d(x[t+dt-kt//2], k[dt]) with zero time
    padding — identical math, different XLA lowering. Motivation: XLA's
    conv3d GRAD-WEIGHT kernel tiles pathologically (measured ~5-6x the
    forward cost vs ~1x for the 2D convs at batch N*T; see
    scripts/profile_backward.py), and the conv backward is ~77% of the
    headline train step. Select with DL_SWIN_GAN_CONV3D=tap (read at trace
    time).

    x: [N, T, Y, X, Cin] channels-last; kernel: [kt, ky, kx, Cin, Cout].
    """
    kt, n, t = kernel.shape[0], x.shape[0], x.shape[1]
    pad = kt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    dn = jax.lax.conv_dimension_numbers(
        (n * t,) + x.shape[2:], kernel.shape[1:], ("NYXC", "YXIO", "NYXC"))
    out = None
    for dt in range(kt):
        shifted = jax.lax.dynamic_slice_in_dim(xp, dt, t, axis=1)
        flat = shifted.reshape((n * t,) + x.shape[2:])
        o = jax.lax.conv_general_dilated(flat, kernel[dt], (1, 1), "SAME",
                                         dimension_numbers=dn)
        out = o if out is None else out + o
    return out.reshape((n, t) + out.shape[1:])


def conv_nd(x: jnp.ndarray, kernel: jnp.ndarray, dtype) -> jnp.ndarray:
    """SAME-padded ND conv (no bias) in `dtype`, upcast to f32 after.

    Dispatches 3D convs to the temporal-tap lowering when
    DL_SWIN_GAN_CONV3D=tap/tapc (checked at trace time). The default
    `auto` picks by operating point, per the interleaved probe
    (runs/profile_conv3d_r4.log): at bs=1 XLA's conv3d grad-weight kernel
    tiles pathologically and `tapc` wins the full train step 1.30x (f32) /
    1.66x (bf16); at batch the taps' kt-fold input materialization loses
    (0.56-0.66x at B=8) and OOMs at B=16, so batched shapes keep `xla`.
    CPU always keeps `xla`: the golden-parity tests compare against torch
    at tolerances the tap summation reorder would eat into, and the CPU
    path is the parity oracle, not a performance surface.
    """
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    ndim = kernel.ndim - 2
    mode = os.environ.get("DL_SWIN_GAN_CONV3D", "auto")
    if mode == "auto":
        mode = ("tapc" if x.shape[0] == 1
                and jax.default_backend() != "cpu" else "xla")
    # odd kt only: the tap's symmetric (kt//2, kt//2) time padding matches
    # XLA SAME exactly for odd kernels; even kernels pad asymmetrically
    if (ndim == 3 and kernel.shape[0] > 1 and kernel.shape[0] % 2 == 1
            and mode in ("tap", "tapc")):
        out = (_conv3d_tap if mode == "tap" else _conv3d_tapc)(x, kernel)
    else:
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,) * ndim, padding="SAME",
            dimension_numbers=nn.linear._conv_dimension_numbers(x.shape))
    return out.astype(jnp.float32)


# torch nn.Conv*/nn.Linear default init twins: the reference trains its conv
# trunk with torch defaults — kaiming_uniform_(a=sqrt(5)) on the weight,
# i.e. U(+-sqrt(1/fan_in)) with variance 1/(3*fan_in), and the bias drawn
# U(+-1/sqrt(fan_in)). flax's lecun_normal/zeros defaults have a 3x larger
# weight variance and zero biases; matching the reference's init
# distribution is part of training parity (SURVEY §7 hard parts).
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """U(+-1/sqrt(fan_in)) — torch's conv/linear bias default."""
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def to_channels_last(x: jnp.ndarray) -> jnp.ndarray:
    """[N, C, *spatial] -> [N, *spatial, C]."""
    return jnp.moveaxis(x, 1, -1)


def to_solver_layout(x: jnp.ndarray) -> jnp.ndarray:
    """[N, *spatial, C] -> [N, C, *spatial]."""
    return jnp.moveaxis(x, -1, 1)


def activation(x: jnp.ndarray, act_type: str = "relu") -> jnp.ndarray:
    """Activation applied separately to real/imag parts when complex.

    Reference `Activation` (`resnet3d.py:35-55`).
    """
    if act_type == "none":
        return x
    fn = {"relu": nn.relu, "leaky_relu": nn.leaky_relu}.get(act_type)
    if fn is None:
        raise ValueError(f"Invalid activation type: {act_type}")
    if jnp.iscomplexobj(x):
        return jax.lax.complex(fn(x.real), fn(x.imag))
    return fn(x)


def normalize(x: jnp.ndarray, norm_type: str = "none") -> jnp.ndarray:
    """Parameter-free instance norm (affine=False), split over real/imag.

    Reference `Normalization` (`resnet3d.py:12-32`). 'batch' (affine=False,
    eval-mode-free in the reference default config) is mapped to instance
    norm statistics per example — the reference default is 'none' anyway.
    """
    if norm_type == "none":
        return x
    if norm_type not in ("instance", "batch"):
        raise ValueError(f"Invalid normalization type: {norm_type}")

    def _inorm(v):
        axes = tuple(range(1, v.ndim - 1))  # spatial dims (channels-last)
        mean = v.mean(axes, keepdims=True)
        var = v.var(axes, keepdims=True)
        return (v - mean) * jax.lax.rsqrt(var + 1e-5)

    if jnp.iscomplexobj(x):
        return jax.lax.complex(_inorm(x.real), _inorm(x.imag))
    return _inorm(x)


class ComplexConv(nn.Module):
    """Complex-valued ND convolution as one block-structured real conv.

    (X + iY) * (a + ib) = (X*a - Y*b) + i(X*b + Y*a)
    Reference `ComplexConv3d` (`resnet3d.py:75-106`). Input/output are
    complex channels-last arrays; internally the real/imag features are
    concatenated and convolved with kernel [[X, Y], [-Y, X]] so the whole
    complex product is a single MXU contraction. `dtype` selects the conv
    compute element type (flax nn.Conv semantics: inputs/kernel are cast to
    `dtype`, so bfloat16 rounds before the conv and the output upcasts back
    to float32 afterwards; only the TPU MXU's internal accumulator is f32 —
    other backends may accumulate in bf16). Params stay float32.
    """
    features: int
    kernel_size: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin, cout = x.shape[-1], self.features
        kshape = tuple(self.kernel_size) + (cin, cout)
        fan_in = cin * int(np.prod(self.kernel_size))
        kx = self.param("kernel_re", torch_kernel_init, kshape)
        ky = self.param("kernel_im", torch_kernel_init, kshape)
        br = self.param("bias_re", torch_bias_init(fan_in), (cout,))
        bi = self.param("bias_im", torch_bias_init(fan_in), (cout,))

        # block kernel over stacked [re, im] features
        top = jnp.concatenate([kx, ky], axis=-1)     # produces [re_out, im_out] from re_in
        bot = jnp.concatenate([-ky, kx], axis=-1)    # ... from im_in
        kernel = jnp.concatenate([top, bot], axis=-2)  # [*K, 2cin, 2cout]

        xr = jnp.concatenate([x.real, x.imag], axis=-1)
        # conv fully in self.dtype, upcast after (flax nn.Conv semantics):
        # a float32 preferred_element_type here breaks the VJP (f32 cotangent
        # vs bf16 kernel in the transpose conv); the TPU MXU accumulates in
        # f32 regardless, only the output rounds through self.dtype
        out = conv_nd(xr, kernel, self.dtype)
        out = out + jnp.concatenate([br, bi])
        return jax.lax.complex(out[..., :cout], out[..., cout:])


class _ConvParams(nn.Module):
    """Kernel/bias holder + conv_nd lowering. Named "Conv_0" by its parent
    so the param pytree ("Conv_0/kernel" [*k, Cin, Cout], "Conv_0/bias")
    stays byte-identical to the previous flax nn.Conv nesting — existing
    checkpoints restore unchanged."""
    features: int
    kernel_size: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1] * int(np.prod(self.kernel_size))
        kshape = tuple(self.kernel_size) + (x.shape[-1], self.features)
        kernel = self.param("kernel", torch_kernel_init, kshape)
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        return conv_nd(x, kernel, self.dtype) + bias


class Conv(nn.Module):
    """Real ND conv with SAME padding (reference `Conv3d`, resnet3d.py:58-72).

    The conv lowering goes through conv_nd (DL_SWIN_GAN_CONV3D selects the
    xla conv3d vs the temporal-tap formulation at trace time).
    """
    features: int
    kernel_size: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _ConvParams(self.features, self.kernel_size, self.dtype,
                           name="Conv_0")(x)


class SeparableConv(nn.Module):
    """(2+1)D separable 3D conv: spatial (1,k,k) -> act -> temporal (k,1,1).

    Reference `SeparableConv3d` (resnet3d.py:109-160) — defined upstream and
    exposed through CONV_BLOCK.SEPARABLE, but never wired into the reference
    ResNet; here it is wired (ConvBlock dispatches on `separable`). The
    spatial channel count keeps total parameters equal to a full k^3 conv
    (resnet3d.py:131-136).
    """
    features: int
    kernel_size: Tuple[int, ...]
    act_type: str = "relu"
    is_complex: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size[0]
        cin, cout = x.shape[-1], self.features
        sp = int((k ** 3) * cin * cout / ((k ** 2) * cin + k * cout))
        conv = ComplexConv if self.is_complex else Conv
        h = conv(sp, (1, k, k), dtype=self.dtype)(x)
        h = activation(h, self.act_type)
        return conv(cout, (k, 1, 1), dtype=self.dtype)(h)


class ConvBlock(nn.Module):
    """Pre-activation block: Norm -> Act -> Conv (He et al., arXiv:1603.05027).

    Reference `ConvBlock` (`resnet3d.py:163-208`).
    """
    features: int
    kernel_size: Tuple[int, ...]
    act_type: str = "relu"
    norm_type: str = "none"
    is_complex: bool = False
    dtype: Any = jnp.float32
    separable: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = normalize(x, self.norm_type)
        x = activation(x, self.act_type)
        if self.separable and len(self.kernel_size) == 3:
            return SeparableConv(self.features, self.kernel_size,
                                 self.act_type, self.is_complex,
                                 self.dtype)(x)
        conv = ComplexConv if self.is_complex else Conv
        return conv(self.features, self.kernel_size, dtype=self.dtype)(x)


def circular_pad_time(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Circularly pad the time axis (axis 1 in NTYXC) by `pad` on both sides.

    Reference pads through time then center-crops back
    (`resnet3d.py:277-287`) — the cine cycle is periodic.
    """
    if pad == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[1] = (pad, pad)
    return jnp.pad(x, pads, mode="wrap")


def crop_time(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return x[:, pad:-pad]
