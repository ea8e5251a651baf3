"""Model + solver tests: shapes, gradients, weight sharing, remat, solver
semantics (PGD step, hard-DC k-space consistency), and the multi-chip
sharded train step (pjit consistency vs single device)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl_swin_gan_tpu.models.resnet import ResNet3D
from dl_swin_gan_tpu.solvers import UnrolledSolver
from dl_swin_gan_tpu.ops.sense import SenseOp


B, E, C, T, Y, X = 1, 2, 4, 6, 16, 12


@pytest.fixture
def problem(make_complex):
    y = jnp.asarray(make_complex((B, C, T, Y, X)))
    maps = jnp.asarray(make_complex((B, E, C, 1, Y, X)))
    mask = jnp.asarray(
        (np.random.RandomState(1).rand(B, 1, T, Y, X) > 0.5).astype(np.float32))
    return y, maps, mask


def _solver(dc_mode="pgd", complex_layers=True, **kw):
    return UnrolledSolver(
        make_denoiser=lambda: ResNet3D(num_resblocks=1, num_features=8,
                                       use_complex_layers=complex_layers),
        num_unrolls=2, dc_mode=dc_mode, num_cg_steps=3, **kw)


@pytest.mark.parametrize("dc_mode", ["pgd", "hqs", "dc", "none"])
@pytest.mark.parametrize("complex_layers", [True, False])
def test_solver_forward_backward(problem, dc_mode, complex_layers):
    y, maps, mask = problem
    solver = _solver(dc_mode, complex_layers)
    params = solver.init(jax.random.PRNGKey(0), y, maps, mask)["params"]
    out = solver.apply({"params": params}, y, maps, mask)
    assert out.shape == (B, E, T, Y, X)
    assert out.dtype == jnp.complex64

    def loss(p):
        o = solver.apply({"params": p}, y, maps, mask)
        return jnp.mean(jnp.abs(o) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in flat)
    # every parameter should receive gradient (no dead branches)
    assert any(float(jnp.abs(l).sum()) > 0 for l in flat)


def test_share_weights_param_count(problem):
    y, maps, mask = problem
    shared = _solver(share_weights=True)
    unshared = _solver(share_weights=False)
    p_shared = shared.init(jax.random.PRNGKey(0), y, maps, mask)["params"]
    p_unshared = unshared.init(jax.random.PRNGKey(0), y, maps, mask)["params"]
    n = lambda p: sum(int(np.prod(l.shape)) for l in jax.tree.leaves(p))
    # shared: 1 denoiser + scalar; unshared: 2 denoisers + scalar
    assert n(p_unshared) > 1.9 * (n(p_shared) - 1)


def test_remat_matches_no_remat(problem):
    y, maps, mask = problem
    base = _solver(remat=False)
    remat = _solver(remat=True)
    params = base.init(jax.random.PRNGKey(0), y, maps, mask)["params"]
    out1 = base.apply({"params": params}, y, maps, mask)
    out2 = remat.apply({"params": params}, y, maps, mask)
    assert jnp.allclose(out1, out2, atol=1e-5)

    def loss(mod):
        def f(p):
            return jnp.mean(jnp.abs(mod.apply({"params": p}, y, maps, mask)) ** 2)
        return f

    g1 = jax.grad(loss(base))(params)
    g2 = jax.grad(loss(remat))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pgd_first_step_semantics(problem):
    """With an identity denoiser the first PGD iterate must equal
    x + eta*(A^H A x - A^H y) — the reference update (unrolled.py:104)."""
    y, maps, mask = problem

    class Identity(ResNet3D):
        def __call__(self, x):
            return x

    solver = UnrolledSolver(make_denoiser=Identity, num_unrolls=1, dc_mode="pgd")
    params = solver.init(jax.random.PRNGKey(0), y, maps, mask)["params"]
    out = solver.apply({"params": params}, y, maps, mask)

    A = SenseOp(maps, mask)
    ATy = A(y, adjoint=True)
    eta = np.asarray(params["step_size"])[0]
    expected = ATy + eta * (A.normal(ATy) - ATy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_hard_dc_composition(problem):
    """With an identity denoiser, one hard-DC unroll must compute exactly
    x = A_F^H((1-mask) * A_F(x0) + y), x0 = A^H y — the reference
    DataConsistency update (unrolledDiT.py:162-181)."""
    y, maps, mask = problem
    y = y * mask  # acquired data live on the mask

    class Identity(ResNet3D):
        def __call__(self, x):
            return x

    solver = UnrolledSolver(make_denoiser=Identity, num_unrolls=1, dc_mode="dc")
    variables = solver.init(jax.random.PRNGKey(0), y, maps, mask)
    out = solver.apply(variables, y, maps, mask)

    A = SenseOp(maps, mask)
    AF = SenseOp(maps, None)
    x0 = A(y, adjoint=True)
    expected = AF((1.0 - mask) * AF(x0) + y, adjoint=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_sharded_train_step_matches_single_device(make_complex):
    """pjit data-parallel step == single-device step (TPU's 'fake backend'
    equivalence test, SURVEY §4)."""
    from dl_swin_gan_tpu.parallel.mesh import make_mesh, shard_batch
    from dl_swin_gan_tpu.train import packing

    Bm = 4
    rngnp = np.random.RandomState(0)
    rc = lambda s: (rngnp.randn(*s) + 1j * rngnp.randn(*s)).astype(np.complex64)
    batch = {
        "kspace": rc((Bm, C, T, Y, X)),
        "maps": rc((Bm, E, C, 1, Y, X)),
        "mask": (rngnp.rand(Bm, 1, T, Y, X) > 0.5).astype(np.float32),
        "target": rc((Bm, E, T, Y, X)),
    }
    solver = _solver("pgd")
    packed = packing.pack(batch)

    def init_and_loss(packed_batch):
        b = packing.unpack(packed_batch)
        params = solver.init(jax.random.PRNGKey(0), b["kspace"], b["maps"],
                             b["mask"])["params"]

        def loss(p):
            o = solver.apply({"params": p}, b["kspace"], b["maps"], b["mask"])
            return jnp.mean(jnp.abs(o - b["target"]))

        l, g = jax.value_and_grad(loss)(params)
        gnorm = sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))
        return l, gnorm

    l1, g1 = jax.jit(init_and_loss)(packed)

    mesh = make_mesh(data=4, fsdp=2)
    sharded = shard_batch(packed, mesh)
    l2, g2 = jax.jit(init_and_loss)(sharded)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-3)


def test_resnet_time_equivariance_under_circular_shift(make_complex):
    """Circular time padding makes the denoiser equivariant to cyclic
    time shifts (the cine cycle is periodic)."""
    net = ResNet3D(num_resblocks=1, num_features=8, use_complex_layers=True,
                   circular_pad=True)
    x = jnp.asarray(make_complex((1, 2, 6, 8, 8)))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    out_shift = net.apply({"params": params}, jnp.roll(x, 2, axis=2))
    np.testing.assert_allclose(np.asarray(jnp.roll(out, 2, axis=2)),
                               np.asarray(out_shift), rtol=1e-3, atol=1e-4)


def test_fsdp_actually_shards_large_params():
    """Large parameters must be laid out across the fsdp axis (ZeRO-3
    equivalent), small ones replicated."""
    import jax
    from jax.sharding import PartitionSpec as P

    from dl_swin_gan_tpu.parallel.mesh import fsdp_shardings, make_mesh

    mesh = make_mesh(data=4, fsdp=2)
    big = jax.ShapeDtypeStruct((3, 3, 3, 64, 64), jnp.float32)
    small = jax.ShapeDtypeStruct((64,), jnp.float32)
    sh = fsdp_shardings({"w": big, "b": small}, mesh)
    assert sh["w"].spec == P(None, None, None, "fsdp") or \
        "fsdp" in tuple(sh["w"].spec)
    assert sh["b"].spec == P()
