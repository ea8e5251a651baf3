"""SENSE forward / adjoint / normal operators as pure functions.

TPU-native counterpart of reference `dl_cs/mri/transforms.py:49-111`
(SenseModel). The forward model is
    y = W . F . S x        (image -> masked multicoil k-space)
and the adjoint
    x = S^H . F^H . W y    (masked k-space -> coil-combined image)

Shapes (identical to the reference so HDF5 data ports verbatim):
    x     [B, E, T, Y, X]      complex  (E = ESPIRiT emaps)
    y     [B, C, T, Y, X]      complex  (C = coils)
    maps  [B, E, C, 1, Y, X]   complex
    mask  [B, 1|C, T, Y, X]    real or None (sampling weights W)

Pure functions keep these jit/vmap/pjit friendly; `SenseOp` is a light
closure matching the reference's `A(data, adjoint=...)` calling convention
so solver code reads like the math.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from dl_swin_gan_tpu.ops.fft import fftc, ifftc


def _forward_impl(x, maps, mask):
    """x [B, E, T, Y, X], maps [B, E, C, 1, Y, X] -> y [B, C, T, Y, X].

    Profiling note (v5e): the op is FFT-bound — the coil/emap contraction
    (whether broadcast or unrolled over E) is ~25% of the cost, so the
    simple broadcast form is kept. XLA fuses the multiply into the reduce.
    """
    coil_ims = jnp.sum(x[:, :, None] * maps, axis=1)  # [B, C, T, Y, X]
    ksp = fftc(coil_ims, ndims=2)
    if mask is not None:
        ksp = ksp * mask
    return ksp


def _adjoint_impl(y, maps, mask):
    if mask is not None:
        y = y * mask
    coil_ims = ifftc(y, ndims=2)  # [B, C, T, Y, X]
    # [B, 1, C, T, Y, X] * conj(maps)[B, E, C, 1, Y, X] -> sum coils
    return jnp.sum(coil_ims[:, None] * jnp.conj(maps), axis=2)


# ---------------------------------------------------------------------------
# Custom VJPs. All three SENSE ops are linear in their data argument, so the
# JAX (holomorphic) VJP is exactly
#     vjp_f(g) = conj(f^H(conj(g)))
# which reuses the fused forward code path instead of XLA's auto-derived
# transpose of the FFT/broadcast chain. Wall-clock on v5e is the same as
# autodiff (XLA transposes these chains well); the custom rules are kept
# because they are exact (validated against autodiff to ~1e-7), emit far
# fewer HLOs, and skip cotangent computation for maps/mask — acquisition
# data whose gradients are structurally zero in every training loss here.
# ---------------------------------------------------------------------------

@jax.custom_vjp
def sense_forward(x: jnp.ndarray, maps: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Image -> masked multicoil k-space: y = W*F(sum_e maps_e * x_e).

    Reference `_forward_op` (`transforms.py:92-98`): unsqueeze coil dim,
    multiply by maps, sum over emaps, FFT, mask.
    """
    return _forward_impl(x, maps, mask)


def _forward_fwd(x, maps, mask):
    return _forward_impl(x, maps, mask), (maps, mask)


def _forward_bwd(res, g):
    maps, mask = res
    xbar = jnp.conj(_adjoint_impl(jnp.conj(g), maps, mask))
    return xbar, jnp.zeros_like(maps), (None if mask is None
                                        else jnp.zeros_like(mask))


sense_forward.defvjp(_forward_fwd, _forward_bwd)


@jax.custom_vjp
def sense_adjoint(y: jnp.ndarray, maps: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Masked k-space -> image: x = sum_c conj(maps_c) * F^H(W*y).

    Reference `_adjoint_op` (`transforms.py:84-90`).
    """
    return _adjoint_impl(y, maps, mask)


def _adjoint_fwd(y, maps, mask):
    return _adjoint_impl(y, maps, mask), (maps, mask)


def _adjoint_bwd(res, g):
    maps, mask = res
    ybar = jnp.conj(_forward_impl(jnp.conj(g), maps, mask))
    return ybar, jnp.zeros_like(maps), (None if mask is None
                                        else jnp.zeros_like(mask))


sense_adjoint.defvjp(_adjoint_fwd, _adjoint_bwd)


def _normal_fusable(x, maps, mask) -> bool:
    return (x.ndim == 5 and maps.ndim == 6 and maps.shape[3] == 1
            and (mask is None or (mask.ndim == 5 and mask.shape[1] == 1)))


def _normal_impl(x, maps, mask):
    """A^H W^2 A x — fused Pallas kernel when enabled, XLA chain otherwise.

    The forward masks once and the adjoint masks again, so the fused kernel
    applies w^2 in k-space (identical for binary masks, faithful for
    arbitrary weights).
    """
    from dl_swin_gan_tpu.kernels.sense_normal import (
        sense_normal_fused, use_pallas_sense,
    )
    if use_pallas_sense() and _normal_fusable(x, maps, mask):
        B, E, T, Y, X = x.shape
        m = maps[:, :, :, 0]  # [B, E, C, Y, X]
        if mask is None:
            w = jnp.ones((B, T, Y, X), jnp.float32)
        else:
            w = jnp.broadcast_to(mask[:, 0], (B, T, Y, X))
            w = w * w
        outr, outi = sense_normal_fused(jnp.real(x), jnp.imag(x),
                                        jnp.real(m), jnp.imag(m), w)
        return jax.lax.complex(outr, outi)
    return _adjoint_impl(_forward_impl(x, maps, mask), maps, mask)


@jax.custom_vjp
def sense_normal(x: jnp.ndarray, maps: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Normal operator A^H A x (the CG hot loop).

    Self-adjoint, so its transpose is conj(N(conj(g))) — one extra normal-op
    application instead of XLA's slow auto-transposed chain.
    """
    return _normal_impl(x, maps, mask)


def _normal_fwd(x, maps, mask):
    return sense_normal(x, maps, mask), (maps, mask)


def _normal_bwd(res, g):
    maps, mask = res
    gc = jnp.conj(g)
    xbar = jnp.conj(_normal_impl(gc, maps, mask))
    return xbar, jnp.zeros_like(maps), (None if mask is None
                                        else jnp.zeros_like(mask))


sense_normal.defvjp(_normal_fwd, _normal_bwd)


@dataclass(frozen=True)
class SenseOp:
    """Callable SENSE operator closed over (maps, mask).

    Mirrors the reference `SenseModel` API: `A(x)` is the forward op,
    `A(y, adjoint=True)` the adjoint. Weights default to 1 (no mask).
    """
    maps: jnp.ndarray
    mask: Optional[jnp.ndarray] = None

    def __call__(self, data: jnp.ndarray, adjoint: bool = False) -> jnp.ndarray:
        if adjoint:
            return sense_adjoint(data, self.maps, self.mask)
        return sense_forward(data, self.maps, self.mask)

    def normal(self, x: jnp.ndarray) -> jnp.ndarray:
        return sense_normal(x, self.maps, self.mask)
