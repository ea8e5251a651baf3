"""Full-stack golden parity: the unrolled PGD solver (SenseModel DC + ResNet
denoisers) vs the reference, weight-copied end-to-end.

This is the reference's canonical hot loop (SURVEY §3.1: scripts/train.py ->
unrolled.ProximalGradientDescent -> SenseModel + ResNet). Backbone parity is
covered per-module elsewhere; this test composes DC + denoiser + unroll loop
and compares the final reconstruction."""

import sys
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _load_ref():
    try:
        sys.path.insert(0, "/root/reference")
        import torch  # noqa: F401
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from dl_cs.models import unrolled as ref_unrolled
            from dl_cs.mri import transforms as ref_transforms
        return ref_unrolled, ref_transforms
    except Exception:
        return None


def _ref_cfg(**params):
    """Duck-typed stand-in for the reference CfgNode attribute tree
    (dl_cs.config needs fvcore, absent here; UnrolledNet only reads
    attributes)."""
    from types import SimpleNamespace as NS
    p = dict(NUM_UNROLLS=5, NUM_RESBLOCKS=2, NUM_FEATURES=64, NUM_EMAPS=2,
             SHARE_WEIGHTS=False, FIX_STEP_SIZE=False, GRAD_CHECKPOINT=False,
             MODL=NS(NUM_CG_STEPS=10))
    p.update(params)
    conv = NS(KERNEL_SIZE=[3], COMPLEX=False, CIRCULAR_PAD=True)
    p["CONV_BLOCK"] = conv
    return NS(MODEL=NS(PARAMETERS=NS(**p)))


@pytest.mark.parametrize("meta", ["dlespirit", "modl"])
def test_unrolled_full_stack_matches_reference(make_complex, rng, meta):
    loaded = _load_ref()
    if loaded is None:
        pytest.skip("reference/torch unavailable")
    ref_unrolled, ref_transforms = loaded
    import torch

    from dl_swin_gan_tpu.config import get_cfg
    from dl_swin_gan_tpu.models import build_denoiser
    from dl_swin_gan_tpu.solvers import build_solver
    from tests.test_forward_parity import _map_convblock

    B, E, C, T, Y, X = 1, 2, 4, 6, 16, 12
    unrolls, resblocks, feats = 3, 1, 12

    # --- our config/model
    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "RES"
    cfg.MODEL.META_ARCHITECTURE = meta
    cfg.MODEL.PARAMETERS.NUM_UNROLLS = unrolls
    cfg.MODEL.PARAMETERS.NUM_RESBLOCKS = resblocks
    cfg.MODEL.PARAMETERS.NUM_FEATURES = feats
    cfg.MODEL.PARAMETERS.NUM_EMAPS = E
    cfg.MODEL.PARAMETERS.CONV_BLOCK.COMPLEX = False
    cfg.MODEL.PARAMETERS.FIX_STEP_SIZE = False
    model = build_solver(cfg, lambda: build_denoiser(cfg))

    # --- reference model (duck-typed config; same attribute schema)
    rcfg = _ref_cfg(NUM_UNROLLS=unrolls, NUM_RESBLOCKS=resblocks,
                    NUM_FEATURES=feats, NUM_EMAPS=E)
    torch.manual_seed(11)
    if meta == "dlespirit":
        ref = ref_unrolled.ProximalGradientDescent(rcfg).eval()
        with torch.no_grad():
            ref.step_size.fill_(-0.8)
    else:
        ref = ref_unrolled.HalfQuadraticSplitting(rcfg).eval()
        with torch.no_grad():
            ref.lamda.fill_(0.3)

    # --- shared inputs
    y = make_complex((B, C, T, Y, X))
    maps = make_complex((B, E, C, 1, Y, X))
    mask = (rng.rand(B, 1, T, Y, X) < 0.5).astype(np.float32)
    y = (y * mask).astype(np.complex64)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(y),
                        jnp.asarray(maps), jnp.asarray(mask))["params"]
    params = jax.tree.map(np.asarray, params)
    if meta == "dlespirit":
        params["step_size"] = np.array([-0.8], np.float32)
    else:
        params["lamda"] = np.array([0.3], np.float32)
    for i in range(unrolls):
        rnet = ref.cnn_update[i]
        fnet = params[f"ResNet3D_{i}"]
        _map_convblock(rnet.init_layer, fnet["ConvBlock_0"], False)
        for j, rb in enumerate(rnet.res_blocks):
            blk = fnet[f"GatedResBlock_{j}"]
            _map_convblock(rb.layers[0], blk["ConvBlock_0"], False)
            _map_convblock(rb.layers[1], blk["ConvBlock_1"], False)
        _map_convblock(rnet.final_layer, fnet["ConvBlock_1"], False)

    with torch.no_grad():
        A = ref_transforms.SenseModel(torch.from_numpy(maps),
                                      weights=torch.from_numpy(mask))
        ref_out = ref(torch.from_numpy(y), A).numpy()

    out = np.asarray(model.apply({"params": params}, jnp.asarray(y),
                                 jnp.asarray(maps), jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)
