"""Gaussian diffusion engine for complex MRI reconstruction.

TPU-native counterpart of reference `dl_cs/diffusion/` (OpenAI ADM/IDDPM
lineage adapted to complex images).
"""

from dl_swin_gan_tpu.diffusion.gaussian import (
    GaussianDiffusion, ModelMeanType, ModelVarType, LossType,
    get_named_beta_schedule,
)
from dl_swin_gan_tpu.diffusion.respace import SpacedDiffusion, space_timesteps


def create_diffusion(
    timestep_respacing,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    sigma_small: bool = False,
    predict_xstart: bool = False,
    learn_sigma: bool = True,
    rescale_learned_sigmas: bool = True,
    diffusion_steps: int = 1000,
) -> SpacedDiffusion:
    """Factory mirroring reference `diffusion/__init__.py:10-46`."""
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]
    return SpacedDiffusion(
        use_timesteps=space_timesteps(diffusion_steps, timestep_respacing),
        betas=betas,
        model_mean_type=(ModelMeanType.EPSILON if not predict_xstart
                         else ModelMeanType.START_X),
        model_var_type=(
            (ModelVarType.FIXED_LARGE if not sigma_small
             else ModelVarType.FIXED_SMALL)
            if not learn_sigma else ModelVarType.LEARNED_RANGE),
        loss_type=loss_type,
    )
