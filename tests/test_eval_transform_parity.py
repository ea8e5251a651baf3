"""Golden parity of the seed-1000 evaluation transform vs the reference
`scripts/reconstruct_h5.py` DataTransformSS — the re-undersampling +
normalization protocol every quality row is measured through."""

import importlib.util
import sys
import warnings
from types import SimpleNamespace as NS

import numpy as np
import pytest


def _load_ref_script():
    try:
        sys.path.insert(0, "/root/repo/tests")
        import ref_shims
        import timm_shim
        timm_shim.install()
        ref_shims.install()
        sys.path.insert(0, "/root/reference")
        import torch  # noqa: F401
        spec = importlib.util.spec_from_file_location(
            "ref_reconstruct_h5", "/root/reference/scripts/reconstruct_h5.py")
        mod = importlib.util.module_from_spec(spec)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


def test_resample_transform_matches_reference(make_complex):
    ref_mod = _load_ref_script()
    if ref_mod is None:
        pytest.skip("reference/torch unavailable")

    from dl_swin_gan_tpu.config import get_cfg
    from dl_swin_gan_tpu.infer.transforms import ResampleTransform

    C, E, T, Y, X = 4, 2, 6, 36, 24
    kspace = make_complex((C, T, Y, X))
    maps = make_complex((E, C, 1, Y, X))

    cfg = get_cfg()
    cfg.MODEL.PARAMETERS.SLWIN_INIT = True
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KX = 0.25
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KY = 0.0

    rcfg = NS(MODEL=NS(PARAMETERS=NS(SLWIN_INIT=True)),
              AUG_TRAIN=NS(UNDERSAMPLE=NS(PARTIAL_KX=0.25, PARTIAL_KY=0.0)))

    accel = 6  # the tiny grid can't reach 12x
    ref_t = ref_mod.DataTransformSS(accel, rcfg)
    rk, rm, rmaps, rinit, rscale = (np.asarray(v) for v in
                                    ref_t(kspace.copy(), maps.copy()))

    ours = ResampleTransform(accel, cfg)(kspace.copy(), maps.copy())

    np.testing.assert_array_equal(ours["mask"], rm.astype(np.float32))
    np.testing.assert_allclose(float(ours["scale"]), float(rscale), rtol=1e-6)
    np.testing.assert_allclose(ours["kspace"], rk, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours["init_image"], rinit, rtol=1e-4, atol=1e-5)
