"""Timestep respacing (reference `dl_cs/diffusion/respace.py:12-129`)."""

from typing import Collection, Union

import numpy as np
import jax.numpy as jnp

from dl_swin_gan_tpu.diffusion.gaussian import GaussianDiffusion


def space_timesteps(num_timesteps: int,
                    section_counts: Union[str, Collection[int]]) -> set:
    """Pick which base timesteps to retain (reference :12-62), including the
    "ddimN" fixed striding."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {num_timesteps} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        frac_stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        taken = []
        for _ in range(count):
            taken.append(start_idx + round(cur))
            cur += frac_stride
        all_steps += taken
        start_idx += size
    return set(all_steps)


class SpacedDiffusion(GaussianDiffusion):
    """Skip steps of a base process; model timesteps are remapped through
    `timestep_map` exactly like the reference's _WrappedModel (:112-129) —
    here via the `_wrap_t` hook every model invocation goes through."""

    def __init__(self, use_timesteps, **kwargs):
        self.use_timesteps = set(use_timesteps)
        self.timestep_map = []
        self.original_num_steps = len(kwargs["betas"])

        base = GaussianDiffusion(**kwargs)
        last_alpha_cumprod = 1.0
        new_betas = []
        for i, acp in enumerate(base.alphas_cumprod):
            if i in self.use_timesteps:
                new_betas.append(1 - acp / last_alpha_cumprod)
                last_alpha_cumprod = acp
                self.timestep_map.append(i)
        kwargs["betas"] = np.array(new_betas)
        super().__init__(**kwargs)

    def _wrap_t(self, t):
        return jnp.take(jnp.asarray(self.timestep_map, jnp.int32), t)
