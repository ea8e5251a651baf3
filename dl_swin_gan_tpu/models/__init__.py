"""Denoiser backbones (flax.linen modules, channels-last TPU layout).

TPU-native counterpart of the reference `dl_cs/models/` zoo. Instead of the
reference's class-per-variant sprawl (six near-identical `unrolledX.py`
files), backbones are registered here and composed with solvers from
`dl_swin_gan_tpu.solvers`.
"""

from dl_swin_gan_tpu.models.layers import (
    ComplexConv,
    ConvBlock,
    activation,
    normalize,
    to_channels_last,
    to_solver_layout,
)
from dl_swin_gan_tpu.models.resnet import ResNet3D


def build_denoiser(cfg, deterministic: bool = True):
    """Build a denoiser backbone from a config node (MODEL.MODEL_TYPE).

    Dispatch mirrors the reference's per-script model choice
    (run_script.sh model_type RES/SE/CBAM/SWIN/DIT/Latte).
    `deterministic=False` enables stochastic depth / dropout (training mode)
    for the transformer backbones; conv backbones ignore it.
    """
    p = cfg.MODEL.PARAMETERS
    model_type = cfg.MODEL.MODEL_TYPE.upper()
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if str(p.CONV_BLOCK.DTYPE) == "bfloat16" else jnp.float32
    common = dict(
        num_emaps=p.NUM_EMAPS,
        num_features=p.NUM_FEATURES,
        kernel_size=p.CONV_BLOCK.KERNEL_SIZE[0],
        use_complex_layers=p.CONV_BLOCK.COMPLEX,
        circular_pad=p.CONV_BLOCK.CIRCULAR_PAD,
        act_type=p.CONV_BLOCK.ACTIVATION,
        dtype=dtype,
    )
    sep = dict(separable=p.CONV_BLOCK.SEPARABLE)
    if model_type == "RES":
        return ResNet3D(num_resblocks=p.NUM_RESBLOCKS, **common, **sep)
    if model_type == "SE":
        from dl_swin_gan_tpu.models.se import SEResNet3D
        return SEResNet3D(num_resblocks=p.NUM_RESBLOCKS, reduction=p.RR,
                          **common, **sep)
    if model_type == "CBAM":
        from dl_swin_gan_tpu.models.cbam import CBAMResNet3D
        return CBAMResNet3D(num_resblocks=p.NUM_RESBLOCKS, reduction=p.RR,
                            **common, **sep)
    if model_type == "SWIN":
        from dl_swin_gan_tpu.models.swin import SwinNet3D
        if p.CONV_BLOCK.COMPLEX:
            # the reference wrapper accepts complex-layer Swin
            # (unrolledswin.py:30,52) but no shipped config uses it; a
            # silent fallback to the real split would train a different
            # model than the config states
            raise NotImplementedError(
                "MODEL_TYPE=SWIN with CONV_BLOCK.COMPLEX=True is not "
                "implemented; the Swin trunk runs on real/imag channels "
                "(reference config_swin.yaml also sets COMPLEX: False)")
        return SwinNet3D(
            num_swinblocks=p.NUM_SWINBLOCKS,
            depths=(6,), num_heads=(8,), window_size=(7, 8, 8),
            num_emaps=p.NUM_EMAPS, num_features=p.NUM_FEATURES,
            kernel_size=p.CONV_BLOCK.KERNEL_SIZE[0],
            circular_pad=p.CONV_BLOCK.CIRCULAR_PAD,
            act_type=p.CONV_BLOCK.ACTIVATION,
            deterministic=deterministic,
            dtype=dtype,
        )
    if model_type == "DIT":
        from dl_swin_gan_tpu.models.dit import DiTResNet
        return DiTResNet(
            num_emaps=p.NUM_EMAPS, hidden_size=p.NUM_FEATURES,
            depth=p.NUM_LAYERS, num_heads=p.NUM_HEADS,
            patch_size=tuple(p.PATCH_SIZE), learn_sigma=p.LEARN_SIGMA,
            num_blocks=p.NUM_RESBLOCKS, circular_pad=p.CONV_BLOCK.CIRCULAR_PAD,
            deterministic=deterministic, dtype=dtype,
        )
    if model_type == "SWIN_DIFF":
        from dl_swin_gan_tpu.models.swin_diff import SwinDiffNet
        return SwinDiffNet(
            num_swinblocks=p.NUM_SWINBLOCKS, num_emaps=p.NUM_EMAPS,
            hidden_size=p.NUM_FEATURES, depths=(p.NUM_LAYERS,),
            num_heads=(p.NUM_HEADS,), window_size=(7, 8, 8),
            num_blocks=p.NUM_RESBLOCKS, learn_sigma=p.LEARN_SIGMA,
            circular_pad=p.CONV_BLOCK.CIRCULAR_PAD,
            deterministic=deterministic,
        )
    if model_type == "LATTE":
        from dl_swin_gan_tpu.models.latte import LatteNet
        return LatteNet(
            num_emaps=p.NUM_EMAPS, hidden_size=p.NUM_FEATURES,
            depth=p.NUM_LAYERS, num_heads=p.NUM_HEADS,
            patch_size=tuple(p.PATCH_SIZE)[-1], learn_sigma=p.LEARN_SIGMA,
            num_blocks=p.NUM_RESBLOCKS, circular_pad=p.CONV_BLOCK.CIRCULAR_PAD,
            deterministic=deterministic, dtype=dtype,
        )
    raise ValueError(f"Unknown MODEL_TYPE: {model_type}")
