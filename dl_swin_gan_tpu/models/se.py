"""Squeeze-Excitation ResNet (reference dl_cs/models/se3d.py:441-514)."""

from dl_swin_gan_tpu.models.resnet import GatedResNet3D


class SEResNet3D(GatedResNet3D):
    gate: str = "se"
