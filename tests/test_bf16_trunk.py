"""bfloat16 trunk compute (CONV_BLOCK.DTYPE) across backbones.

The knob selects the matmul/conv compute element type for the denoiser
trunk (convs via models/layers.py conv_nd; DiT/Latte attention+MLP via
models/dit.py Attention/Mlp). Params and the transformer residual stream
stay float32, so bf16 must (a) keep params float32, (b) stay close to the
f32 forward, and (c) produce finite float32 gradients.

Quality evidence for the conv trunk lives in the committed bf16 quality row
(runs/resbf16/recon/eval_12accel.csv: SSIM 0.980 vs 0.975 f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_swin_gan_tpu.config import get_cfg
from dl_swin_gan_tpu.models import build_denoiser


def _cfg(model_type):
    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = model_type
    p = cfg.MODEL.PARAMETERS
    p.NUM_EMAPS = 2
    p.NUM_FEATURES = 32 if model_type == "RES" else 48
    p.NUM_RESBLOCKS = 1
    p.NUM_LAYERS = 2
    p.NUM_HEADS = 4
    p.PATCH_SIZE = (2, 4, 4)
    p.CONV_BLOCK.COMPLEX = False
    return cfg


def _forward(cfg, x, t):
    model = build_denoiser(cfg)
    variables = model.init(jax.random.PRNGKey(0), x, t, jnp.zeros((1,), jnp.int32)) \
        if cfg.MODEL.MODEL_TYPE in ("DIT", "Latte") else \
        model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]

    def apply(p, v):
        if cfg.MODEL.MODEL_TYPE in ("DIT", "Latte"):
            return model.apply({"params": p}, v, t, jnp.zeros((1,), jnp.int32))
        return model.apply({"params": p}, v)

    return params, apply


@pytest.mark.parametrize("model_type", ["RES", "SWIN", "DIT", "Latte"])
def test_bf16_trunk_close_to_f32_with_finite_grads(model_type):
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.standard_normal((1, 2, 4, 16, 16))
                     + 1j * rng.standard_normal((1, 2, 4, 16, 16))
                     ).astype(np.complex64))
    t = jnp.asarray([3])

    cfg = _cfg(model_type)
    params, apply = _forward(cfg, x, t)

    cfg_bf = _cfg(model_type)
    cfg_bf.MODEL.PARAMETERS.CONV_BLOCK.DTYPE = "bfloat16"
    params_bf, apply_bf = _forward(cfg_bf, x, t)

    # params are float32 under both dtypes (same init → identical trees)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_bf)):
        assert b.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # perturb away from init: the zero-initialized adaLN gates/FinalLayer
    # make the transformer contribution exactly zero at init (and Latte's
    # whole output — it has no SFE residual path), which would leave the
    # bf16-vs-f32 comparison vacuous
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [p + 0.03 * jax.random.normal(k, p.shape, p.dtype)
              for p, k in zip(leaves, keys)]
    params = params_bf = jax.tree.unflatten(treedef, leaves)

    out32 = np.asarray(jax.jit(apply)(params, x))
    out16 = np.asarray(jax.jit(apply_bf)(params_bf, x))
    assert out16.dtype == np.complex64
    scale = max(np.abs(out32).max(), 1e-6)
    # bf16 has ~3 decimal digits; the trunk rounds activations per layer
    assert np.abs(out32 - out16).max() / scale < 0.1
    # and the two must genuinely differ (the knob is actually wired)
    assert np.abs(out32 - out16).max() > 0

    def loss(p):
        return jnp.sum(jnp.abs(apply_bf(p, x)) ** 2)

    grads = jax.jit(jax.grad(loss))(params_bf)
    for g in jax.tree.leaves(grads):
        assert g.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(g)))
