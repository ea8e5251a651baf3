"""dl_swin_gan_tpu — TPU-native dynamic-MRI reconstruction framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the PyTorch
reference `tjtiger86/dl-swin-gan` (package `dl_cs`): unrolled optimization
networks (SENSE data consistency interleaved with learned denoisers) and
diffusion reconstruction (DiT / Latte backbones) for dynamic (2D+time) MRI
from undersampled multicoil k-space.

Layout:
    ops/        complex linear-operator core (FFT, SENSE, CG, masks, LLR, metrics)
    kernels/    Pallas TPU kernels for the hot operators
    models/     denoiser backbones (ResNet3D, SE, CBAM, SwinUNet3D, DiT, Latte)
    solvers/    unrolled meta-architectures (PGD, HQS/MoDL, hard-DC, DSLR)
    diffusion/  Gaussian diffusion engine (schedules, respacing, conditional DC sampling)
    data/       HDF5/CFL IO, cine preprocessing, synthetic phantom generator
    parallel/   mesh construction + sharding rules (data / fsdp axes)
    train/      train step, optimizer/EMA state, checkpointing, logging
    infer/      reconstruction + evaluation entry points
    config/     YAML config system (key-compatible with the reference configs)
"""

__version__ = "0.1.0"
