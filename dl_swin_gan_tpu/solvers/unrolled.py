"""Unrolled-solver combinator: (DC rule x denoiser x num_unrolls).

TPU-native redesign of the reference's six near-identical meta-architecture
files (`dl_cs/models/unrolled.py`, `unrolledSE.py`, `unrolledCBAM.py`,
`unrolledswin.py`, `unrolledDiT.py`, `unrolledLatte.py`). One flax module
parameterized by the data-consistency rule covers them all:

  dlespirit / pgd   x <- x + eta * (A^H A x - A^H y); then CNN
                    (reference unrolled.py:72-117, learnable eta init -2.0)
  modl / hqs        z = CNN(x); x = CG-solve((A^H A + lam) x = A^H y + lam z)
                    (reference unrolled.py:120-167)
  dc                x = CNN(x); x = A^H(A_unacq(x) + y)  hard k-space
                    replacement keeping acquired lines
                    (reference unrolledDiT.py:137-181 `DataConsistency`)
  none / ddpm       pure denoiser chain, no physics
                    (reference unrolledDiT.py:102-135 `DDPM`)

Per-unroll rematerialization mirrors the reference's gradient checkpointing
(unrolled.py:111-115) via jax.checkpoint; weight sharing reuses one denoiser
instance across unrolls exactly like the `[ResNet()]*N` trick
(unrolled.py:56-59).
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dl_swin_gan_tpu.ops.cg import conjugate_gradient
from dl_swin_gan_tpu.ops.sense import SenseOp


class UnrolledSolver(nn.Module):
    """Alternate data-consistency and denoising for `num_unrolls` steps.

    Call signature: solver(y, maps, mask, x0=None, cond=None)
      y     [N, C, T, Y, X] complex   masked k-space
      maps  [N, E, C, 1, Y, X] complex
      mask  [N, 1, T, Y, X] float
      x0    [N, E, T, Y, X] complex   optional init (e.g. sliding-window)
      cond  optional tuple of extra denoiser args (e.g. (t, c) for DiT)
    """
    make_denoiser: Callable[[], nn.Module]
    num_unrolls: int = 5
    dc_mode: str = "pgd"           # pgd | hqs | dc | none
    share_weights: bool = False
    fix_step_size: bool = False
    num_cg_steps: int = 10         # hqs only
    remat: bool = False

    @nn.compact
    def __call__(self, y, maps, mask, x0=None, cond=None):
        A = SenseOp(maps, mask)
        ATy = A(y, adjoint=True)
        x = ATy if x0 is None else x0

        n_nets = 1 if self.share_weights else self.num_unrolls
        nets = [self.make_denoiser() for _ in range(n_nets)]

        def denoise(i, v):
            net = nets[0 if self.share_weights else i]
            args = (v,) if cond is None else (v, *cond)
            if self.remat:
                return nn.remat(lambda mdl, *a: mdl(*a))(net, *args)
            return net(*args)

        def maybe_fixed(p):
            return jax.lax.stop_gradient(p) if self.fix_step_size else p

        if self.dc_mode == "pgd":
            step = self.param("step_size", nn.initializers.constant(-2.0),
                              (1,), jnp.float32)
            eta = maybe_fixed(step)[0]
            for i in range(self.num_unrolls):
                x = x + eta * (A.normal(x) - ATy)
                x = denoise(i, x)

        elif self.dc_mode == "hqs":
            lam = self.param("lamda", nn.initializers.constant(0.1),
                             (1,), jnp.float32)
            mu = maybe_fixed(lam)[0]
            normal = lambda m: A.normal(m) + mu * m
            for i in range(self.num_unrolls):
                z = denoise(i, x)
                x = conjugate_gradient(normal, x, ATy + mu * z, self.num_cg_steps)

        elif self.dc_mode == "dc":
            # hard k-space replacement: acquired samples from y, the rest
            # from the model estimate (reference unrolledDiT.py:170)
            A1 = SenseOp(maps, 1.0 - mask)
            AF = SenseOp(maps, None)
            for i in range(self.num_unrolls):
                x = denoise(i, x)
                x = AF(A1(x) + y, adjoint=True)

        elif self.dc_mode == "none":
            for i in range(self.num_unrolls):
                x = denoise(i, x)

        else:
            raise ValueError(f"Unknown dc_mode: {self.dc_mode}")

        return x


_DC_MODE_FROM_META = {
    "dlespirit": "pgd",
    "pgd": "pgd",
    "modl": "hqs",
    "hqs": "hqs",
    "ddpm_x": "dc",
    "dc": "dc",
    "ddpm_e": "none",
    "ddpm": "none",
    "none": "none",
}


def build_solver(cfg, make_denoiser: Callable[[], nn.Module],
                 dc_mode: Optional[str] = None) -> UnrolledSolver:
    """Construct the solver from a reference-schema config.

    META_ARCHITECTURE mapping follows the reference trainers
    (scripts/train.py:39-44, train_DiT.py:106-116).
    """
    p = cfg.MODEL.PARAMETERS
    meta = (dc_mode or cfg.MODEL.META_ARCHITECTURE).lower()
    if meta not in _DC_MODE_FROM_META:
        raise ValueError(f"Unknown META_ARCHITECTURE: {meta}")
    return UnrolledSolver(
        make_denoiser=make_denoiser,
        num_unrolls=p.NUM_UNROLLS,
        dc_mode=_DC_MODE_FROM_META[meta],
        share_weights=p.SHARE_WEIGHTS,
        fix_step_size=p.FIX_STEP_SIZE,
        num_cg_steps=p.MODL.NUM_CG_STEPS,
        remat=p.GRAD_CHECKPOINT,
    )
