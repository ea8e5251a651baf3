"""CBAM ResNet (reference dl_cs/models/CBAM.py:477-639)."""

from dl_swin_gan_tpu.models.resnet import GatedResNet3D


class CBAMResNet3D(GatedResNet3D):
    gate: str = "cbam"
