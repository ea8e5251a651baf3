"""Centered / modulated N-D complex FFTs.

TPU-native counterpart of the reference `dl_cs/mri/transforms.py:12-46` (FFT
module) and `dl_cs/mri/utils.py:7-19` (fftmod). XLA lowers jnp.fft over the
innermost axes directly onto the TPU FFT path, so we always transform the
trailing `ndims` axes and keep the operator layout [..., t, y, x].
"""

import jax.numpy as jnp


def _fft_axes(ndims: int) -> tuple:
    return tuple(range(-ndims, 0))


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
