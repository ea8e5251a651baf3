"""Unrolled meta-architectures for diffusion denoisers (DiT / Latte).

TPU-native counterpart of reference `dl_cs/models/unrolledDiT.py` /
`unrolledLatte.py` (identical up to the backbone import — here the backbone
is injected, collapsing both files):

  ddpm / none   pure (t, c)-conditioned denoiser chain, no physics
                (unrolledDiT.py:102-135 `DDPM`)
  dc            denoise then hard k-space replacement
                x <- A_F^H(A_1(x) + A(x0)), where x0 is the solver INPUT
                image (the noisy x_t), not raw k-space
                (unrolledDiT.py:137-181 `DataConsistency`, DC at :170)
  pgd           x <- x + eta (A^H A x - x0); denoise — x0 here plays A^H y
                (unrolledDiT.py:183-231)
  hqs           MoDL with CG inner solve (unrolledDiT.py:268-315)

`learn_sigma=True` makes only the FINAL unroll emit 2x channels
(unrolledDiT.py:61-83).
"""

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from dl_swin_gan_tpu.ops.cg import conjugate_gradient


class DiffusionUnrolled(nn.Module):
    """Callable as model(x0, t, A=..., A_1=..., A_F=..., A_S=..., fs=..., c=...)
    matching the reference model_kwargs protocol (train_DiT.py:253-258), or
    positionally as model(x0, t, c) with SenseOps passed via kwargs.
    """
    make_denoiser: Callable[[bool], nn.Module]  # (learn_sigma_final) -> module
    num_unrolls: int = 4
    dc_mode: str = "dc"            # dc | none | pgd | hqs
    share_weights: bool = False
    fix_step_size: bool = False
    learn_sigma: bool = False
    num_cg_steps: int = 10
    remat: bool = False

    @nn.compact
    def __call__(self, x0, t, A=None, A_1=None, A_F=None, A_S=None, fs=None,
                 c=None):
        n_nets = 1 if self.share_weights else self.num_unrolls
        nets = [self.make_denoiser(False) for _ in range(n_nets)]
        if self.learn_sigma:
            # final unroll gets the 2x-channel head (unrolledDiT.py:61-83)
            if self.share_weights:
                nets = [nets[0], self.make_denoiser(True)]
            else:
                nets[-1] = self.make_denoiser(True)

        def denoise(i, v):
            if self.share_weights:
                net = nets[-1] if (self.learn_sigma
                                   and i == self.num_unrolls - 1) else nets[0]
            else:
                net = nets[i]
            if self.remat:
                return nn.remat(lambda mdl, *a: mdl(*a))(net, v, t, c)
            return net(v, t, c)

        x = x0
        if self.dc_mode in ("none", "ddpm"):
            for i in range(self.num_unrolls):
                x = denoise(i, x)

        elif self.dc_mode == "dc":
            for i in range(self.num_unrolls):
                x = denoise(i, x)
                x = A_F(A_1(x) + A(x0), adjoint=True)

        elif self.dc_mode == "pgd":
            step = self.param("step_size", nn.initializers.constant(-2.0),
                              (1,), jnp.float32)
            eta = (jax.lax.stop_gradient(step) if self.fix_step_size else step)[0]
            ATy = x0
            for i in range(self.num_unrolls):
                x = x + eta * (A(A(x), adjoint=True) - ATy)
                x = denoise(i, x)

        elif self.dc_mode == "hqs":
            lam = self.param("lamda", nn.initializers.constant(0.1),
                             (1,), jnp.float32)
            mu = (jax.lax.stop_gradient(lam) if self.fix_step_size else lam)[0]
            ATy = x0
            normal = lambda m: A(A(m), adjoint=True) + mu * m
            for i in range(self.num_unrolls):
                z = denoise(i, x)
                x = conjugate_gradient(normal, x, ATy + mu * z, self.num_cg_steps)

        else:
            raise ValueError(f"Unknown dc_mode: {self.dc_mode}")

        return x


_META_TO_MODE = {
    "dlespirit": "pgd",
    "modl": "hqs",
    "ddpm_x": "dc",
    "ddpm_e": "none",
}


def build_diffusion_solver(cfg, make_denoiser) -> DiffusionUnrolled:
    """make_denoiser(learn_sigma: bool) -> (t,c)-conditioned flax module.
    META_ARCHITECTURE mapping follows train_DiT.py:106-116."""
    p = cfg.MODEL.PARAMETERS
    meta = cfg.MODEL.META_ARCHITECTURE.lower()
    if meta not in _META_TO_MODE:
        raise ValueError(f"Unknown META_ARCHITECTURE: {meta}")
    return DiffusionUnrolled(
        make_denoiser=make_denoiser,
        num_unrolls=p.NUM_UNROLLS,
        dc_mode=_META_TO_MODE[meta],
        share_weights=p.SHARE_WEIGHTS,
        fix_step_size=p.FIX_STEP_SIZE,
        learn_sigma=p.LEARN_SIGMA,
        num_cg_steps=p.MODL.NUM_CG_STEPS,
        remat=p.GRAD_CHECKPOINT,
    )
