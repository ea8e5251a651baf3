"""Fused LLR-block SENSE normal operator (kernels/llr_normal.py) vs the
plain operator chain block_op(A.normal(block_op(blk, adjoint=True))) —
matrix form on CPU, Pallas kernel in interpreter mode, VJP, and the
solver-level wiring behind DL_SWIN_GAN_PALLAS_DSLR=1."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dl_swin_gan_tpu.kernels.llr_normal as LN
from dl_swin_gan_tpu.ops.llr import BlockOp
from dl_swin_gan_tpu.ops.sense import sense_normal


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if LN._HAS_PALLAS:
        orig = LN.pl.pallas_call
        monkeypatch.setattr(LN.pl, "pallas_call",
                            lambda *a, **kw: orig(*a, interpret=True, **kw))
    # same env-var gate as production, minus the TPU-backend check so the
    # solver wiring can be exercised on CPU in interpreter mode
    import os
    monkeypatch.setattr(
        LN, "use_pallas_llr",
        lambda: os.environ.get("DL_SWIN_GAN_PALLAS_DSLR") == "1"
        and LN._HAS_PALLAS)


def _problem(rng, E=1, C=2, T=4, Y=18, X=12, B=4):
    """Small LLR geometry: BlockOp over [1, E, T, Y, X], random maps/mask."""
    def c64(*s):
        return (rng.standard_normal(s)
                + 1j * rng.standard_normal(s)).astype(np.complex64)

    block_op = BlockOp(B, (1, E, T, Y, X))
    blk = c64(block_op.num_blocks, E * B * B, T)
    maps = c64(1, E, C, 1, Y, X)
    mask = (rng.rand(1, 1, T, Y, X) < 0.5).astype(np.float32)
    return block_op, jnp.asarray(blk), jnp.asarray(maps), jnp.asarray(mask)


def _chain(block_op, blk, maps, mask):
    """The XLA chain the kernel replaces (solvers/dslr.py normal_L/R)."""
    img = block_op(blk, adjoint=True)
    return block_op(sense_normal(img, maps, mask))


def _kernel_args(block_op, maps, mask):
    py, px, dinv = LN.projection_matrices(block_op)
    m = maps[0, :, :, 0]
    t, y, x = block_op.nt, block_op.ny, block_op.nx
    if mask is None:
        w2 = jnp.ones((t, y, x), jnp.float32)
    else:
        w = jnp.broadcast_to(mask[0, 0], (t, y, x))
        w2 = w * w
    return m, w2, jnp.asarray(py), jnp.asarray(px), jnp.asarray(dinv)


def test_mats_blocks_roundtrip(rng):
    block_op, blk, _, _ = _problem(rng)
    mats = LN.blocks_to_mats(blk, block_op)
    assert mats.shape == (block_op.nt, block_op.ne,
                          block_op.num_blocks_y * block_op.block_size,
                          block_op.num_blocks_x * block_op.block_size)
    back = LN.mats_to_blocks(mats, block_op)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(blk))


@pytest.mark.parametrize("E", [1, 2])
def test_matrix_form_matches_chain(rng, E):
    block_op, blk, maps, mask = _problem(rng, E=E)
    ref = _chain(block_op, blk, maps, mask)

    m, w2, py, px, dinv = _kernel_args(block_op, maps, mask)
    mats = LN.blocks_to_mats(blk, block_op)[None]
    out = LN.llr_normal_matrix(mats, m, w2, py, px, dinv)
    got = LN.mats_to_blocks(out[0], block_op)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_matrix_form_no_mask(rng):
    block_op, blk, maps, _ = _problem(rng, C=3, T=2)
    ref = _chain(block_op, blk, maps, None)
    m, w2, py, px, dinv = _kernel_args(block_op, maps, None)
    mats = LN.blocks_to_mats(blk, block_op)[None]
    got = LN.mats_to_blocks(
        LN.llr_normal_matrix(mats, m, w2, py, px, dinv)[0], block_op)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not LN._HAS_PALLAS, reason="no pallas")
@pytest.mark.parametrize("E", [1, 2])
def test_pallas_kernel_matches_matrix(rng, E):
    block_op, blk, maps, mask = _problem(rng, E=E)
    m, w2, py, px, dinv = _kernel_args(block_op, maps, mask)
    mats = LN.blocks_to_mats(blk, block_op)[None]

    ref = LN.llr_normal_matrix(mats, m, w2, py, px, dinv)
    got = LN.llr_normal_fused(mats, m, w2, py, px, dinv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not LN._HAS_PALLAS, reason="no pallas")
def test_pallas_kernel_batched_systems(rng):
    """Grid S=2 (the jacobi paired-CG layout) == two S=1 calls."""
    block_op, blk, maps, mask = _problem(rng)
    blk2 = jnp.roll(blk, 1, axis=0)
    m, w2, py, px, dinv = _kernel_args(block_op, maps, mask)
    m1 = LN.blocks_to_mats(blk, block_op)[None]
    m2 = LN.blocks_to_mats(blk2, block_op)[None]
    both = jnp.concatenate([m1, m2], axis=0)

    out = LN.llr_normal_fused(both, m, w2, py, px, dinv)
    ref1 = LN.llr_normal_fused(m1, m, w2, py, px, dinv)
    ref2 = LN.llr_normal_fused(m2, m, w2, py, px, dinv)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref1[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref2[0]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not LN._HAS_PALLAS, reason="no pallas")
def test_pallas_kernel_under_vmap(rng):
    """The DSLR trainer vmaps the solver for B>1; the kernel must batch
    (pallas vmap rule adds a grid dim)."""
    block_op, blk, maps, mask = _problem(rng, T=3)
    m, w2, py, px, dinv = _kernel_args(block_op, maps, mask)
    m1 = LN.blocks_to_mats(blk, block_op)[None]
    m2 = LN.blocks_to_mats(jnp.roll(blk, 3, axis=0), block_op)[None]
    both = jnp.stack([m1, m2])  # [2, 1, T, E, YB, XB]

    out = jax.vmap(lambda v: LN.llr_normal_fused(v, m, w2, py, px, dinv))(
        both)
    ref1 = LN.llr_normal_fused(m1, m, w2, py, px, dinv)
    ref2 = LN.llr_normal_fused(m2, m, w2, py, px, dinv)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not LN._HAS_PALLAS, reason="no pallas")
def test_fused_adjoint_and_vjp(rng):
    """<M b1, b2> == <b1, M^H b2> (Dinv post) and the custom VJP matches
    autodiff through the plain chain."""
    block_op, blk, maps, mask = _problem(rng, T=3)
    m, w2, py, px, dinv = _kernel_args(block_op, maps, mask)
    b1 = LN.blocks_to_mats(blk, block_op)[None]
    b2 = LN.blocks_to_mats(jnp.roll(blk, 2, axis=-1), block_op)[None]

    Mb1 = LN._apply_fused(b1, m, w2, py, px, dinv, "pre")
    Mhb2 = LN._apply_fused(b2, m, w2, py, px, dinv, "post")
    lhs = jnp.vdot(Mb1, b2)
    rhs = jnp.vdot(b1, Mhb2)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-3, atol=1e-3)

    def loss_fused(v):
        mats = LN.blocks_to_mats(v, block_op)[None]
        out = LN.llr_normal_fused(mats, m, w2, py, px, dinv)
        return jnp.sum(jnp.abs(out) ** 2)

    def loss_ref(v):
        return jnp.sum(jnp.abs(_chain(block_op, v, maps, mask)) ** 2)

    g_fused = jax.grad(loss_fused)(blk)
    g_ref = jax.grad(loss_ref)(blk)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not LN._HAS_PALLAS, reason="no pallas")
def test_solver_fused_path_matches_plain(rng, monkeypatch):
    """UnrolledLR with the fused normal (forced on) == the plain XLA path,
    for the golden-parity CG mode and the jacobi fast mode."""
    from dl_swin_gan_tpu.ops.llr import decompose
    from dl_swin_gan_tpu.solvers.dslr import UnrolledLR
    import dl_swin_gan_tpu.solvers.dslr as dslr_mod

    E, C, T, Y, X, B, r = 1, 2, 4, 18, 12, 4, 3

    def c64(*s):
        return (rng.standard_normal(s)
                + 1j * rng.standard_normal(s)).astype(np.complex64)

    y = jnp.asarray(c64(1, C, T, Y, X))
    maps = jnp.asarray(c64(1, E, C, 1, Y, X))
    mask = jnp.asarray((rng.rand(1, 1, T, Y, X) < 0.5).astype(np.float32))
    block_op = BlockOp(B, (1, E, T, Y, X))
    blk0 = jnp.asarray(c64(block_op.num_blocks, E * B * B, T))
    L0, R0 = decompose(blk0, r)

    for mode in ("dslr-cg-v1", "dslr-cg-jacobi", "dslr-pgd", "modslr-v2"):
        model = UnrolledLR(mode=mode, num_unrolls=1, num_resblocks=1,
                           num_features=4, num_emaps=E, num_basis=r,
                           block_size=B, num_cg_steps=3)
        params = model.init(jax.random.PRNGKey(0), y, maps, mask, L0, R0,
                            block_op)
        out_plain = model.apply(params, y, maps, mask, L0, R0, block_op)
        monkeypatch.setenv("DL_SWIN_GAN_PALLAS_DSLR", "1")
        out_fused = model.apply(params, y, maps, mask, L0, R0, block_op)
        monkeypatch.delenv("DL_SWIN_GAN_PALLAS_DSLR")
        np.testing.assert_allclose(np.asarray(out_fused),
                                   np.asarray(out_plain),
                                   rtol=2e-3, atol=2e-3)


def test_fused_path_with_blockop_built_inside_jit(rng, monkeypatch):
    """The trainer/profiler builds BlockOp INSIDE the jitted step, where its
    `weights` is a tracer — projection_matrices must not materialize it
    (r5 TPU regression: TracerArrayConversionError in the A/B harness)."""
    E, C, T, Y, X, B = 1, 2, 4, 18, 12, 4

    def c64(*s):
        return (rng.standard_normal(s)
                + 1j * rng.standard_normal(s)).astype(np.complex64)

    maps = jnp.asarray(c64(1, E, C, 1, Y, X))
    mask = jnp.asarray((rng.rand(1, 1, T, Y, X) < 0.5).astype(np.float32))
    block_op_eager = BlockOp(B, (1, E, T, Y, X))
    blk = jnp.asarray(c64(block_op_eager.num_blocks, E * B * B, T))
    want = _chain(block_op_eager, blk, maps, mask)

    monkeypatch.setenv("DL_SWIN_GAN_PALLAS_DSLR", "1")

    @jax.jit
    def fused_inside_jit(blk, maps, mask):
        op = BlockOp(B, (1, E, T, Y, X))  # weights becomes a tracer here
        fused = LN.make_fused_block_normal(op, maps, mask)
        return fused(blk)

    got = fused_inside_jit(blk, maps, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_projection_dinv_matches_fold_weights():
    """The separable numpy fold normalization == combine(extract(ones))."""
    for (Y, X, B) in ((18, 12, 4), (180, 64, 16)):
        op = BlockOp(B, (1, 2, 3, Y, X))
        py, px, dinv = LN.projection_matrices(op)
        w_ref = np.real(np.asarray(op.weights[0, 0, 0]))
        np.testing.assert_allclose(1.0 / dinv - 1e-8, w_ref,
                                   rtol=1e-5, atol=1e-5)
