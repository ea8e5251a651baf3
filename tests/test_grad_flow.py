"""Every parameter of every solver family must receive gradient.

Forward parity proves VALUES; it cannot see a stray stop_gradient, a
detached branch, or dead wiring, which silently freeze parameters during
training (the reference has no equivalent hazard — torch autograd tracks
everything by default, JAX requires the graph to actually be connected).
Params are jittered away from init first: at the true zero-init point the
adaLN-Zero gates legitimately zero the gradients of the gated branches.

fix_step_size/stop-gradient paths are configured OFF so every leaf is
expected to be live.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl_swin_gan_tpu.config import get_cfg
from dl_swin_gan_tpu.models import build_denoiser
from dl_swin_gan_tpu.solvers import build_solver


def _jitter(params, scale=0.02, seed=1):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    out = [np.asarray(l) + scale * np.asarray(
        jax.random.normal(k, np.shape(l), jnp.float32))
        for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, out)


def _dead_set(grads):
    return {jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_flatten_with_path(grads)[0]
            if float(jnp.sum(jnp.abs(v))) == 0.0}


def _assert_all_live(grad_fn, params, tag):
    """A leaf counts as dead only if its gradient is zero at EVERY jitter
    point — a single random point can sit in a legitimately flat region
    (dead ReLU in a 4-unit SE/CBAM gate, the modslr clamp below zero)
    without any wiring bug."""
    dead = _dead_set(grad_fn(_jitter(params, seed=1)))
    for seed in (2, 3):
        if not dead:
            break
        dead &= _dead_set(grad_fn(_jitter(params, scale=0.1, seed=seed)))
    assert not dead, f"{tag}: parameters with ZERO gradient: {sorted(dead)}"


@pytest.mark.parametrize("model_type,meta", [
    ("RES", "dlespirit"), ("RES", "modl"), ("SE", "dlespirit"),
    ("CBAM", "dlespirit"), ("SWIN", "dlespirit"),
])
def test_unrolled_solver_all_params_get_grads(make_complex, rng, model_type,
                                              meta):
    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = model_type
    cfg.MODEL.META_ARCHITECTURE = meta
    p = cfg.MODEL.PARAMETERS
    p.NUM_UNROLLS = 2
    p.NUM_RESBLOCKS = 1
    p.NUM_SWINBLOCKS = 1
    p.NUM_FEATURES = 8
    p.NUM_EMAPS = 2
    p.RR = 2
    p.FIX_STEP_SIZE = False
    p.MODL.NUM_CG_STEPS = 3
    p.CONV_BLOCK.COMPLEX = (model_type == "RES")

    B, E, C, T, Y, X = 1, 2, 3, 4, 16, 12
    y = jnp.asarray(make_complex((B, C, T, Y, X)))
    maps = jnp.asarray(make_complex((B, E, C, 1, Y, X)))
    mask = jnp.asarray((rng.random((B, 1, T, Y, X)) > 0.5)
                       .astype(np.float32))

    solver = build_solver(cfg, lambda: build_denoiser(cfg))
    params = solver.init(jax.random.PRNGKey(0), y, maps, mask)["params"]

    def loss(pp):
        out = solver.apply({"params": pp}, y, maps, mask)
        return jnp.mean(jnp.abs(out) ** 2)

    _assert_all_live(jax.grad(loss), params, f"{model_type}/{meta}")


@pytest.mark.parametrize("model_type", ["DIT", "LATTE", "SWIN_DIFF"])
def test_diffusion_solver_all_params_get_grads(make_complex, rng,
                                               model_type):
    from dl_swin_gan_tpu.ops.sense import SenseOp
    from dl_swin_gan_tpu.solvers.diffusion_unrolled import (
        build_diffusion_solver)
    from dl_swin_gan_tpu.train.diffusion_trainer import (
        make_diffusion_denoiser_factory)

    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = model_type
    cfg.MODEL.META_ARCHITECTURE = "DDPM_X"
    p = cfg.MODEL.PARAMETERS
    p.NUM_UNROLLS = 2
    p.NUM_RESBLOCKS = 0
    p.NUM_LAYERS = 2
    p.NUM_HEADS = 2
    p.NUM_FEATURES = 24
    p.NUM_EMAPS = 2
    p.LEARN_SIGMA = False
    p.CONV_BLOCK.COMPLEX = False

    B, E, C, T, Y, X = 1, 2, 3, 4, 16, 12
    x0 = jnp.asarray(make_complex((B, E, T, Y, X)))
    maps = jnp.asarray(make_complex((B, E, C, 1, Y, X)))
    mask = jnp.asarray((rng.random((B, 1, T, Y, X)) > 0.5)
                       .astype(np.float32))
    t = jnp.asarray(np.array([7], np.int32))
    c = jnp.ones((B,), jnp.int32)
    kwargs = dict(A=SenseOp(maps, mask), A_1=SenseOp(maps, 1.0 - mask),
                  A_F=SenseOp(maps, None), A_S=SenseOp(maps, mask),
                  fs=x0, c=c)

    solver = build_diffusion_solver(
        cfg, make_diffusion_denoiser_factory(cfg, deterministic=True))
    params = solver.init(jax.random.PRNGKey(0), x0, t, **kwargs)["params"]

    def loss(pp):
        out = solver.apply({"params": pp}, x0, t, **kwargs)
        return jnp.mean(jnp.abs(out) ** 2)

    _assert_all_live(jax.grad(loss), params, model_type)


def test_dslr_solver_all_params_get_grads(make_complex, rng):
    from dl_swin_gan_tpu.ops.llr import BlockOp, decompose_init
    from dl_swin_gan_tpu.solvers.dslr import UnrolledLR

    B, E, C, T, Y, X = 1, 1, 3, 4, 16, 16
    shape = (B, E, T, Y, X)
    y = jnp.asarray(make_complex((B, C, T, Y, X)))
    maps = jnp.asarray(make_complex((B, E, C, 1, Y, X)))
    mask = jnp.asarray((rng.random((B, 1, T, Y, X)) > 0.5)
                       .astype(np.float32))
    init = np.asarray(make_complex(shape))
    L0, R0 = decompose_init(init, block_size=8, rank=2)

    solver = UnrolledLR(mode="modslr-v2", num_unrolls=2, num_resblocks=1,
                        num_features=8, num_emaps=E, num_basis=2,
                        block_size=8, num_cg_steps=2,
                        use_complex_layers=True, circular_pad=True,
                        fix_step_size=False)
    block_op = BlockOp(8, shape, xp=jnp)
    params = solver.init(jax.random.PRNGKey(0), y, maps, mask,
                         jnp.asarray(L0), jnp.asarray(R0),
                         block_op)["params"]

    def loss(pp):
        out = solver.apply({"params": pp}, y, maps, mask, jnp.asarray(L0),
                           jnp.asarray(R0), block_op)
        return jnp.mean(jnp.abs(out) ** 2)

    def grad_at(pp):
        # keep the clamped lambdas in their live (positive) region — the
        # reference's 1e2*clamp(lambda, 0) is legitimately flat below 0
        pp = dict(pp)
        pp["lambda_l"] = np.abs(pp["lambda_l"]) + 1e-3
        pp["lambda_r"] = np.abs(pp["lambda_r"]) + 1e-3
        return jax.grad(loss)(pp)

    _assert_all_live(grad_at, params, "modslr-v2")
