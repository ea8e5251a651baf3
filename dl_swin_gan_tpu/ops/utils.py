"""Small k-space / image utilities (pure jnp).

TPU-native counterpart of reference `dl_cs/mri/utils.py:7-79`.
"""

from typing import Sequence

import jax.numpy as jnp


def root_sum_of_squares(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """RSS coil combine (`utils.py:22-26`)."""
    return jnp.sqrt(jnp.sum(jnp.abs(x) ** 2, axis=axis))


def get_mask(data: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Recover the sampling mask from nonzero k-space (`utils.py:69-79`)."""
    return (jnp.abs(data) > eps).astype(jnp.float32)


def time_average(data: jnp.ndarray, axis: int, eps: float = 1e-6,
                 keepdims: bool = True) -> jnp.ndarray:
    """Average acquired (nonzero) samples across `axis` (`utils.py:29-34`)."""
    mask = get_mask(data)
    return data.sum(axis, keepdims=keepdims) / (mask.sum(axis, keepdims=keepdims) + eps)


def sliding_window(data: jnp.ndarray, axis: int, window_size: int) -> jnp.ndarray:
    """Circular sliding-window view-sharing init (`utils.py:37-49`).

    For each frame i, roll the time axis by window_size//2 - i, take the first
    `window_size` frames, and time-average acquired samples. The time extent is
    static at trace time so the Python loop unrolls into fixed-shape XLA ops.
    """
    nt = data.shape[axis]
    assert 0 < window_size <= nt
    windows = []
    for i in range(nt):
        shifted = jnp.roll(data, int(window_size / 2) - i, axis=axis)
        window = jnp.take(shifted, jnp.arange(window_size), axis=axis)
        windows.append(time_average(window, axis))
    return jnp.concatenate(windows, axis=axis)


def center_crop(data: jnp.ndarray, shapes: Sequence[int],
                axes: Sequence[int]) -> jnp.ndarray:
    """Center crop along the given axes (`utils.py:52-66`)."""
    slicer = [slice(None)] * data.ndim
    for size, ax in zip(shapes, axes):
        assert 0 < size <= data.shape[ax]
        start = (data.shape[ax] - size) // 2
        slicer[ax] = slice(start, start + size)
    return data[tuple(slicer)]


def center_pad(data: jnp.ndarray, shapes: Sequence[int],
               axes: Sequence[int]) -> jnp.ndarray:
    """Zero-pad symmetrically to the target sizes (inverse of center_crop).

    TPU addition: used to round spatial dims up to static tile-friendly sizes.
    """
    pads = [(0, 0)] * data.ndim
    for size, ax in zip(shapes, axes):
        extra = size - data.shape[ax]
        assert extra >= 0
        lo = extra // 2
        pads[ax] = (lo, extra - lo)
    return jnp.pad(data, pads)
