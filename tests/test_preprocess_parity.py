"""Golden parity of the full training preprocess against the PyTorch
reference pipeline on identical inputs (the BASELINE.md parity protocol:
identical seeds => identical masks, normalization, and network inputs)."""

import sys
import warnings

import numpy as np
import pytest

from dl_swin_gan_tpu.config import get_cfg
from dl_swin_gan_tpu.data.preprocess import CinePreprocess
from dl_swin_gan_tpu.data.synthetic import make_cine_example


def _load_reference():
    try:
        sys.path.insert(0, "/root/reference")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from dl_cs.data.preprocess import CinePreprocess as RefPre
        return RefPre
    except Exception:
        return None


class _RefCfg:
    """Minimal attribute-tree shim for the reference CinePreprocess."""

    def __init__(self, cfg):
        self._cfg = cfg

    def __getattr__(self, name):
        v = getattr(self._cfg, name)
        return _RefCfg(v) if hasattr(v, "keys") else v


@pytest.mark.parametrize("crop_readout,slwin", [(0, False), (48, True)])
def test_cine_preprocess_matches_reference(crop_readout, slwin):
    RefPre = _load_reference()
    if RefPre is None:
        pytest.skip("reference/torch unavailable")

    cfg = get_cfg()
    cfg.AUG_TRAIN.CROP_READOUT = crop_readout
    cfg.AUG_TRAIN.UNDERSAMPLE.ACCELERATIONS = (8, 10)
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KX = 0.25
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KY = 0.0
    cfg.MODEL.PARAMETERS.SLWIN_INIT = slwin

    kspace, maps, target = make_cine_example(T=10, Y=64, X=96, C=6, E=2,
                                             seed=3)
    fname = "parity_case.h5"

    ours = CinePreprocess(cfg, use_seed=True)(kspace, maps, target, fname)

    ref_pre = RefPre(_RefCfg(cfg), use_seed=True)
    ref_out = ref_pre(kspace.copy(), maps.copy(), target.copy(), fname)
    r_ksp, r_mask, r_maps, r_init, r_scale, r_target = [
        x.numpy() if hasattr(x, "numpy") else x for x in ref_out]

    np.testing.assert_array_equal(ours["mask"], r_mask)
    np.testing.assert_allclose(float(ours["scale"]), float(r_scale),
                               rtol=1e-5)
    np.testing.assert_allclose(ours["kspace"], r_ksp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours["maps"], r_maps, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours["target"], r_target, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours["init_image"], r_init, rtol=1e-4,
                               atol=1e-5)
