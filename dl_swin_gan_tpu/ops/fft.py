"""Centered / modulated N-D complex FFTs.

TPU-native counterpart of the reference `dl_cs/mri/transforms.py:12-46` (FFT
module) and `dl_cs/mri/utils.py:7-19` (fftmod). Always transforms the
trailing `ndims` axes, keeping the operator layout [..., t, y, x].

Two lowering paths:
  - "xla":    jnp.fft -> the TPU FFT path (VPU-bound).
  - "matmul": explicit DFT matrices contracted on the MXU. The cine axes are
    small (64-192), so the O(n^2) DFT-matmul costs ~n/log n more FLOPs than
    the FFT but runs on the systolic array at a far higher issue rate, and
    XLA can fuse the surrounding SENSE elementwise work into the matmuls.
    Matrices are trace-time numpy constants per (n, direction, norm).

DL_SWIN_GAN_FFT=xla|matmul selects the path (default "auto": matmul on TPU,
xla on CPU/GPU). Precision: DL_SWIN_GAN_FFT_PRECISION=highest|default
(default highest: full-f32 accumulate; "default" allows bf16 MXU passes).
"""

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


def _fft_axes(ndims: int) -> tuple:
    return tuple(range(-ndims, 0))


def _mode() -> str:
    m = os.environ.get("DL_SWIN_GAN_FFT", "auto")
    if m == "auto":
        try:
            return "matmul" if jax.default_backend() not in ("cpu", "gpu") \
                else "xla"
        except Exception:
            return "xla"
    return m


def _precision():
    if os.environ.get("DL_SWIN_GAN_FFT_PRECISION", "highest") == "default":
        return None
    return jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _dft_mat(n: int, inverse: bool, norm: str) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    sign = 2j if inverse else -2j
    m = np.exp(sign * np.pi * np.outer(k, k) / n)
    if norm == "ortho":
        m /= np.sqrt(n)
    elif inverse:
        m /= n
    return m.astype(np.complex64)


def _dft_apply(data: jnp.ndarray, ndims: int, inverse: bool,
               norm: str) -> jnp.ndarray:
    prec = _precision()
    for ax in range(-ndims, 0):
        n = data.shape[ax]
        mat = jnp.asarray(_dft_mat(n, inverse, norm))
        moved = jnp.moveaxis(data, ax, -1)
        out = jnp.einsum("...x,xk->...k", moved, mat, precision=prec)
        data = jnp.moveaxis(out, -1, ax)
    return data


def fftc(data: jnp.ndarray, ndims: int = 2, norm: str = "ortho",
         centered: bool = False) -> jnp.ndarray:
    """Forward FFT over the trailing `ndims` axes.

    Matches reference FFT.forward(adjoint=False) semantics
    (`dl_cs/mri/transforms.py:28-46`): optional ifftshift/fftshift sandwich
    when `centered`, ortho normalization by default.
    """
    axes = _fft_axes(ndims)
    if centered:
        data = jnp.fft.ifftshift(data, axes=axes)
    if _mode() == "matmul":
        data = _dft_apply(data, ndims, inverse=False, norm=norm)
    else:
        data = jnp.fft.fftn(data, axes=axes, norm=norm)
    if centered:
        data = jnp.fft.fftshift(data, axes=axes)
    return data


def ifftc(data: jnp.ndarray, ndims: int = 2, norm: str = "ortho",
          centered: bool = False) -> jnp.ndarray:
    """Inverse FFT over the trailing `ndims` axes (reference adjoint=True path)."""
    axes = _fft_axes(ndims)
    if centered:
        data = jnp.fft.ifftshift(data, axes=axes)
    if _mode() == "matmul":
        data = _dft_apply(data, ndims, inverse=True, norm=norm)
    else:
        data = jnp.fft.ifftn(data, axes=axes, norm=norm)
    if centered:
        data = jnp.fft.fftshift(data, axes=axes)
    return data


def fft_centered(data: jnp.ndarray, ndims: int = 2, adjoint: bool = False,
                 norm: str = "ortho") -> jnp.ndarray:
    """Convenience wrapper with explicit centering (ifftshift -> fft -> fftshift)."""
    if adjoint:
        return ifftc(data, ndims=ndims, norm=norm, centered=True)
    return fftc(data, ndims=ndims, norm=norm, centered=True)


def fftmod(data: jnp.ndarray) -> jnp.ndarray:
    """Checkerboard modulation so FFT shifts can be skipped.

    Reference semantics (`dl_cs/mri/utils.py:7-19`, in-place there):
        out[..., ::2]    *= -1   # even x
        out[..., ::2, :] *= -1   # even y
        out              *= -1
    i.e. multiply element (y, x) by (-1)^(x + y + 1). Implemented functionally
    with a broadcast (-1) pattern over the trailing two axes.
    """
    ny, nx = data.shape[-2], data.shape[-1]
    iy = jnp.arange(ny).reshape(ny, 1)
    ix = jnp.arange(nx).reshape(1, nx)
    sign = jnp.where((iy + ix + 1) % 2 == 0, 1.0, -1.0).astype(
        data.real.dtype if jnp.iscomplexobj(data) else data.dtype)
    return data * sign
