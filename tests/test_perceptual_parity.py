"""VGG perceptual-loss wiring parity vs the reference.

torchvision (and its pretrained VGG16) are absent from this image, so the
previous excuse for the perceptual loss was "parity not demonstrable".
tests/torchvision_shim.py provides the two torchvision symbols the
reference imports, with a singleton random-weight VGG16 — identical conv
weights are then loaded into both frameworks' wiring and the loss VALUES
compared (reference `dl_cs/utils/metrics.py:41-117` vggloss +
`VGGloss.py:6-54` VGG_Loss vs `train/perceptual.py`)."""

import sys
import warnings

import numpy as np
import pytest


def _load_ref_metrics():
    try:
        sys.path.insert(0, "/root/repo/tests")
        import torchvision_shim
        torchvision_shim.install()
        sys.path.insert(0, "/root/reference")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from dl_cs.utils import metrics  # noqa: F401
        return metrics
    except Exception:
        return None


def test_vggloss_value_matches_reference(make_complex, tmp_path):
    metrics = _load_ref_metrics()
    if metrics is None:
        pytest.skip("reference/torch unavailable")
    import torch

    from torchvision_shim import vgg16
    from dl_swin_gan_tpu.train.perceptual import (
        PerceptualLoss, convert_torchvision_vgg16,
    )

    torch.manual_seed(7)
    # re-randomize the singleton so the test doesn't depend on import order
    for m in vgg16().features:
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.init.normal_(m.weight, 0, 0.05)
            torch.nn.init.normal_(m.bias, 0, 0.05)

    # export the singleton's weights the same way a real torchvision
    # checkpoint would be converted
    sd_path = str(tmp_path / "vgg16.pt")
    npz_path = str(tmp_path / "vgg16.npz")
    torch.save(vgg16().state_dict(), sd_path)
    convert_torchvision_vgg16(sd_path, npz_path)

    ours = PerceptualLoss(weights_npz=npz_path)
    assert ours.pretrained

    E, T, Y, X = 2, 3, 48, 40
    ref_img = make_complex((1, E, T, Y, X))
    pred_img = make_complex((1, E, T, Y, X))

    with torch.no_grad():
        ref_val = float(metrics.vggloss(torch.from_numpy(ref_img),
                                        torch.from_numpy(pred_img)))
    import jax.numpy as jnp
    ours_val = float(ours(jnp.asarray(ref_img), jnp.asarray(pred_img)))
    # bilinear-resize implementations differ slightly between frameworks
    np.testing.assert_allclose(ours_val, ref_val, rtol=2e-3)


def test_vggloss_magnitude_input(make_complex, tmp_path):
    """Real (magnitude) inputs take the repeat-to-3-channels path."""
    metrics = _load_ref_metrics()
    if metrics is None:
        pytest.skip("reference/torch unavailable")
    import torch
    from torchvision_shim import vgg16
    from dl_swin_gan_tpu.train.perceptual import (
        PerceptualLoss, convert_torchvision_vgg16,
    )

    sd_path = str(tmp_path / "vgg16.pt")
    npz_path = str(tmp_path / "vgg16.npz")
    torch.save(vgg16().state_dict(), sd_path)
    convert_torchvision_vgg16(sd_path, npz_path)
    ours = PerceptualLoss(weights_npz=npz_path)

    E, T, Y, X = 2, 2, 40, 32
    a = np.abs(make_complex((1, E, T, Y, X))).astype(np.float32)
    b = np.abs(make_complex((1, E, T, Y, X))).astype(np.float32)

    with torch.no_grad():
        ref_val = float(metrics.vggloss(torch.from_numpy(a),
                                        torch.from_numpy(b)))
    import jax.numpy as jnp
    ours_val = float(ours(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours_val, ref_val, rtol=2e-3)
