"""Unrolled meta-architectures (solvers) composed with any denoiser backbone."""

from dl_swin_gan_tpu.solvers.unrolled import (
    UnrolledSolver,
    build_solver,
)
