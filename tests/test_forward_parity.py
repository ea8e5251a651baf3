"""Weight-level forward parity vs the PyTorch reference: instantiate the
reference denoiser, copy its weights into our flax module, and compare
forward outputs on identical inputs. This is the strongest model-parity
evidence short of training runs."""

import sys
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl_swin_gan_tpu.models.resnet import ResNet3D
from dl_swin_gan_tpu.models.se import SEResNet3D


def _load_ref(modname):
    try:
        sys.path.insert(0, "/root/reference")
        import torch  # noqa: F401
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            __import__(f"dl_cs.models.{modname}")
        return sys.modules[f"dl_cs.models.{modname}"]
    except Exception:
        return None


def _t2f_conv(w):
    """torch conv weight [out, in, kt, ky, kx] -> flax [kt, ky, kx, in, out]."""
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 4, 1, 0))


def _map_convblock(ref_block, flax_block, is_complex):
    """Reference ConvBlock.layers = (Norm, Act, Conv) -> our ConvBlock tree."""
    conv = ref_block.layers[2]
    if is_complex:
        br = conv.conv_r.bias.detach().numpy()
        bi = conv.conv_i.bias.detach().numpy()
        flax_block["ComplexConv_0"]["kernel_re"] = _t2f_conv(conv.conv_r.weight)
        flax_block["ComplexConv_0"]["kernel_im"] = _t2f_conv(conv.conv_i.weight)
        # ref adds conv biases inside each real conv:
        # out_re = Xa + b_r - (Yb + b_i); out_im = Xb + b_r + (Ya + b_i)
        flax_block["ComplexConv_0"]["bias_re"] = jnp.asarray(br - bi)
        flax_block["ComplexConv_0"]["bias_im"] = jnp.asarray(br + bi)
    else:
        flax_block["Conv_0"]["Conv_0"]["kernel"] = _t2f_conv(conv.conv.weight)
        flax_block["Conv_0"]["Conv_0"]["bias"] = jnp.asarray(
            conv.conv.bias.detach().numpy())


@pytest.mark.parametrize("is_complex", [True, False])
def test_resnet3d_forward_matches_reference(is_complex, make_complex):
    ref_mod = _load_ref("resnet3d")
    if ref_mod is None:
        pytest.skip("reference/torch unavailable")
    import torch

    E, T, Y, X = 2, 6, 12, 10
    in_chans = E if is_complex else 2 * E
    torch.manual_seed(0)
    ref = ref_mod.ResNet(num_resblocks=2, in_chans=in_chans, chans=16,
                         kernel_size=3, use_complex_layers=is_complex,
                         circular_pad=True).eval()

    net = ResNet3D(num_resblocks=2, num_features=16, kernel_size=3,
                   use_complex_layers=is_complex, circular_pad=True)
    x = make_complex((1, E, T, Y, X))
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = jax.tree.map(np.asarray, params)

    _map_convblock(ref.init_layer, params["ConvBlock_0"], is_complex)
    for i, rb in enumerate(ref.res_blocks):
        blk = params[f"GatedResBlock_{i}"]
        _map_convblock(rb.layers[0], blk["ConvBlock_0"], is_complex)
        _map_convblock(rb.layers[1], blk["ConvBlock_1"], is_complex)
    _map_convblock(ref.final_layer, params["ConvBlock_1"], is_complex)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    out = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)


def test_se_resnet_forward_matches_reference(make_complex):
    ref_mod = _load_ref("se3d")
    if ref_mod is None:
        pytest.skip("reference/torch unavailable")
    import torch

    E, T, Y, X = 2, 6, 12, 10
    torch.manual_seed(1)
    ref = ref_mod.SeResNet(num_resblocks=1, in_chans=2 * E, chans=16, rr=4,
                           kernel_size=3, use_complex_layers=False,
                           circular_pad=True).eval()

    net = SEResNet3D(num_resblocks=1, num_features=16, kernel_size=3,
                     reduction=4, use_complex_layers=False, circular_pad=True)
    x = make_complex((1, E, T, Y, X))
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = jax.tree.map(np.asarray, params)

    _map_convblock(ref.init_layer, params["ConvBlock_0"], False)
    blk = params["GatedResBlock_0"]
    srb = ref.se_res_blocks[0]
    _map_convblock(srb.layers1[0], blk["ConvBlock_0"], False)
    _map_convblock(srb.layers1[1], blk["ConvBlock_1"], False)
    # SE gate: GAP -> FC(rr) -> relu -> FC(C) -> sigmoid
    se = srb.layers2.layers  # (GlobalAvgPool, FC1, Act, FC2, Act)
    gate = blk["ChannelGate_0"]
    gate["Dense_0"]["kernel"] = jnp.asarray(
        se[1].fc.weight.detach().numpy().T)
    gate["Dense_0"]["bias"] = jnp.asarray(se[1].fc.bias.detach().numpy())
    gate["Dense_1"]["kernel"] = jnp.asarray(
        se[3].fc.weight.detach().numpy().T)
    gate["Dense_1"]["bias"] = jnp.asarray(se[3].fc.bias.detach().numpy())
    _map_convblock(ref.final_layer, params["ConvBlock_1"], False)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    out = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)


def test_cbam_resnet_forward_matches_reference(make_complex):
    """CBAM: channel gate (avg-only) then spatial gate (k=5 conv, no sigmoid).

    DiT/Latte/Swin reference modules import timm (not in this image), so
    CBAM is the last reference backbone loadable for golden comparison."""
    ref_mod = _load_ref("CBAM")
    if ref_mod is None:
        pytest.skip("reference/torch unavailable")
    import torch

    from dl_swin_gan_tpu.models.cbam import CBAMResNet3D

    E, T, Y, X = 2, 6, 12, 10
    torch.manual_seed(2)
    ref = ref_mod.CBAMResNet(num_resblocks=1, in_chans=2 * E, chans=16, rr=4,
                             kernel_size=3, use_complex_layers=False,
                             circular_pad=True).eval()

    net = CBAMResNet3D(num_resblocks=1, num_features=16, kernel_size=3,
                       reduction=4, use_complex_layers=False,
                       circular_pad=True)
    x = make_complex((1, E, T, Y, X))
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = jax.tree.map(np.asarray, params)

    _map_convblock(ref.init_layer, params["ConvBlock_0"], False)
    blk = params["GatedResBlock_0"]
    crb = ref.se_res_blocks[0]
    _map_convblock(crb.layers1[0], blk["ConvBlock_0"], False)
    _map_convblock(crb.layers1[1], blk["ConvBlock_1"], False)
    # channel attention: FC(rr) -> relu -> FC(C) -> sigmoid (avg-pool path)
    ca = crb.CAmodule[0].layers  # Sequential(FC1, act, FC2, act)
    gate = blk["ChannelGate_0"]
    gate["Dense_0"]["kernel"] = jnp.asarray(ca[0].fc.weight.detach().numpy().T)
    gate["Dense_0"]["bias"] = jnp.asarray(ca[0].fc.bias.detach().numpy())
    gate["Dense_1"]["kernel"] = jnp.asarray(ca[2].fc.weight.detach().numpy().T)
    gate["Dense_1"]["bias"] = jnp.asarray(ca[2].fc.bias.detach().numpy())
    # spatial attention: channel-mean -> k=5 conv (1 -> 1 channels)
    sa = crb.SAmodule[0].layers[0]  # Conv3d wrapper
    sg = blk["SpatialGate_0"]
    sg["Conv_0"]["Conv_0"]["kernel"] = _t2f_conv(sa.conv.weight)
    sg["Conv_0"]["Conv_0"]["bias"] = jnp.asarray(sa.conv.bias.detach().numpy())
    _map_convblock(ref.final_layer, params["ConvBlock_1"], False)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    out = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)
