"""LLR block-op + DSLR solver tests, including golden parity of
extract/combine against the reference torch implementation."""

import importlib.util
import sys
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl_swin_gan_tpu.ops.llr import (
    BlockOp, btranspose, compose, decompose, decompose_init,
)
from dl_swin_gan_tpu.ops.cg import zdot

SHAPE = (1, 2, 6, 36, 28)  # [1, e, t, y, x]


@pytest.fixture
def image(make_complex):
    return make_complex(SHAPE)


def test_extract_combine_identity(image):
    """combine(extract(x)) == x — the reference computes exactly this as its
    normalization weights (lowrank.py:59-60)."""
    op = BlockOp(8, SHAPE, overlapping=True, xp=np)
    blocks = op.extract(image)
    assert blocks.shape == (op.num_blocks, 2 * 64, 6)
    back = op.combine(blocks)
    np.testing.assert_allclose(back, image, rtol=1e-4, atol=1e-5)


def test_blockop_adjointness(image):
    """<extract(x), b> == <x, combine_unnormalized(b)> for the windowed
    unfold — verified through jnp path for autodiff consistency."""
    op = BlockOp(8, SHAPE, overlapping=True, xp=jnp)
    x = jnp.asarray(image)
    rngnp = np.random.RandomState(1)
    b = jnp.asarray((rngnp.randn(op.num_blocks, 2 * 64, 6)
                     + 1j * rngnp.randn(op.num_blocks, 2 * 64, 6))
                    .astype(np.complex64))
    # combine includes the weight normalization (not the pure adjoint), so
    # test the adjoint identity on the unnormalized fold:
    ex = op.extract(x)
    w = op.weights

    def combine_unnorm(bb):
        return op._fold(bb * op.win)[..., (op.ny_pad - op.ny) // 2:
                                     (op.ny_pad - op.ny) // 2 + op.ny,
                                     (op.nx_pad - op.nx) // 2:
                                     (op.nx_pad - op.nx) // 2 + op.nx]

    lhs = zdot(ex, b)
    rhs = zdot(x, combine_unnorm(b))
    assert np.isclose(complex(lhs), complex(rhs), rtol=1e-3)


def test_extract_matches_reference_torch(image):
    """Golden parity of the block operator against the torch reference."""
    try:
        import torch
        sys.path.insert(0, "/root/reference")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from dl_cs.mri.lowrank import ArrayToBlocks
    except Exception:
        pytest.skip("reference/torch unavailable")

    ref_op = ArrayToBlocks(8, list(SHAPE), overlapping=True)
    ref_blocks = ref_op(torch.from_numpy(image)).numpy()

    op = BlockOp(8, SHAPE, overlapping=True, xp=np)
    blocks = op.extract(image)
    np.testing.assert_allclose(blocks, ref_blocks, rtol=1e-4, atol=1e-5)

    # the reference combine mutates its input in-place (lowrank.py:167),
    # and torch.from_numpy shares memory — hand it a copy
    ref_back = ref_op(torch.from_numpy(blocks.copy()), adjoint=True).numpy()
    back = op.combine(blocks)
    np.testing.assert_allclose(back, ref_back, rtol=1e-4, atol=1e-5)


def test_decompose_compose_lowrank(image):
    """Full-rank decomposition reconstructs the image exactly."""
    op = BlockOp(8, SHAPE, overlapping=True, xp=np)
    blocks = op.extract(image)
    L, R = decompose(blocks, rank=6, xp=np)  # t=6 => full rank
    np.testing.assert_allclose(L @ btranspose(R), blocks, rtol=1e-3, atol=1e-3)
    img = compose(L, R, op)
    np.testing.assert_allclose(img, image, rtol=1e-3, atol=1e-4)


def test_decompose_init_shapes(image):
    L, R = decompose_init(image, block_size=8, rank=4)
    op = BlockOp(8, SHAPE, xp=np)
    assert L.shape == (op.num_blocks, 2 * 64, 4)
    assert R.shape == (op.num_blocks, 6, 4)
    assert L.dtype == np.complex64


@pytest.mark.parametrize("mode", ["dslr-pgd", "dslr-cg-v1", "dslr-cg-v2",
                                  "dslr-cg-jacobi", "modslr-v1",
                                  "modslr-v2"])
def test_dslr_solver_forward(make_complex, mode):
    from dl_swin_gan_tpu.solvers.dslr import UnrolledLR

    B, E, C, T, Y, X = 1, 1, 3, 4, 20, 16
    rngnp = np.random.RandomState(0)
    y = jnp.asarray(make_complex((B, C, T, Y, X)))
    maps = jnp.asarray(make_complex((B, E, C, 1, Y, X)))
    mask = jnp.asarray((rngnp.rand(B, 1, T, Y, X) > 0.4).astype(np.float32))

    shape = (B, E, T, Y, X)
    block_op = BlockOp(8, shape, xp=jnp)
    init = np.zeros(shape, np.complex64)
    init[:] = np.asarray(make_complex(shape))
    L0, R0 = decompose_init(init, block_size=8, rank=3)

    solver = UnrolledLR(mode=mode, num_unrolls=1, num_resblocks=1,
                        num_features=8, num_emaps=E, num_basis=3,
                        block_size=8, num_cg_steps=2)
    variables = solver.init(jax.random.PRNGKey(0), y, maps, mask,
                            jnp.asarray(L0), jnp.asarray(R0), block_op)
    out = solver.apply(variables, y, maps, mask, jnp.asarray(L0),
                       jnp.asarray(R0), block_op)
    assert out.shape == shape
    assert np.isfinite(np.abs(np.asarray(out))).all()

    def loss(v):
        o = solver.apply(v, y, maps, mask, jnp.asarray(L0), jnp.asarray(R0),
                         block_op)
        return jnp.mean(jnp.abs(o) ** 2)

    g = jax.grad(loss)(variables)
    leaves = jax.tree.leaves(g)
    assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_dslr_trainer_batched_apply_matches_per_example(make_complex):
    """B>1 goes through a vmapped solver (TPU-native extension; the
    reference is strictly bs=1, train_lr.py:125): the batched apply must
    equal stacking the single-example applies."""
    from dl_swin_gan_tpu.config import get_cfg
    from dl_swin_gan_tpu.train.dslr_trainer import DSLRTrainer

    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "RES"
    cfg.MODEL.META_ARCHITECTURE = "dslr-cg-v1"
    p = cfg.MODEL.PARAMETERS
    p.NUM_UNROLLS = 1
    p.NUM_RESBLOCKS = 1
    p.NUM_FEATURES = 8
    p.NUM_EMAPS = 1
    p.DSLR.BLOCK_SIZE = 8
    p.DSLR.NUM_BASIS = 3
    p.DSLR.NUM_CG_STEPS = 2
    cfg.OUTPUT_DIR = "/tmp/dslr_batched_test"
    cfg.MODEL.STRATEGY = "none"

    B, E, C, T, Y, X = 2, 1, 3, 4, 20, 16
    rngnp = np.random.RandomState(1)
    kspace = jnp.asarray(make_complex((B, C, T, Y, X)))
    maps = jnp.asarray(make_complex((B, E, C, 1, Y, X)))
    mask = jnp.asarray((rngnp.rand(B, 1, T, Y, X) > 0.4).astype(np.float32))
    init = np.asarray(make_complex((B, E, T, Y, X)))
    Ls, Rs = zip(*[decompose_init(init[i:i + 1], block_size=8, rank=3)
                   for i in range(B)])
    batch = {"kspace": kspace, "maps": maps, "mask": mask,
             "L_init": jnp.asarray(np.stack(Ls)),
             "R_init": jnp.asarray(np.stack(Rs)),
             "target": jnp.asarray(init)}

    trainer = DSLRTrainer(cfg)
    state = trainer.init_state(batch)

    out_b = np.asarray(trainer._apply(state.params, batch))
    assert out_b.shape == (B, E, T, Y, X)
    for i in range(B):
        one = {k: v[i:i + 1] for k, v in batch.items()}
        out_1 = np.asarray(trainer._apply(state.params, one))
        np.testing.assert_allclose(out_b[i:i + 1], out_1, rtol=2e-4,
                                   atol=2e-5 * np.abs(out_1).max())


def test_decompose_init_composed_matches_reference(image):
    """The loader's L0/R0 SVD init (preprocess.py:166-168 semantics) vs the
    reference `Decompose` oracle. Individual L/R factors are only defined up
    to a per-block unitary rotation of the rank subspace, so the invariant
    compared is the composed rank-r approximation L R^H (and the captured
    energy), which truncated SVD makes unique."""
    import numpy as np

    try:
        sys.path.insert(0, "/root/reference")
        import torch
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from dl_cs.mri import lowrank as ref_lr
    except Exception:
        pytest.skip("reference/torch unavailable")

    block, rank = 8, 3
    img = np.asarray(image)  # [1, e, t, y, x] complex

    L, R = decompose_init(img, block_size=block, rank=rank)
    op = BlockOp(block, img.shape, xp=np)
    ours = op.combine(L @ np.conj(np.transpose(R, (0, 2, 1))))

    ref_op = ref_lr.Decompose(block, rank, list(img.shape),
                              overlapping=True, device="cpu")
    with torch.no_grad():
        Lr, Rr = ref_op.decompose(torch.from_numpy(img))
        theirs = ref_op.compose(Lr, Rr).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-4,
                               atol=1e-5 * np.abs(theirs).max())
    # same captured energy per block (sum of kept singular values squared)
    np.testing.assert_allclose(
        np.sum(np.abs(L) ** 2, axis=(1, 2)),
        np.sum(np.abs(Lr.numpy()) ** 2, axis=(1, 2)), rtol=1e-4)
