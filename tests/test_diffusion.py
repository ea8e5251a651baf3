"""Diffusion engine tests: schedule identities, q/p consistency, respacing,
conditional-DC sampling invariants, k-space loss gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl_swin_gan_tpu.diffusion import (
    create_diffusion, GaussianDiffusion, ModelMeanType, ModelVarType,
    LossType, space_timesteps, get_named_beta_schedule,
)
from dl_swin_gan_tpu.diffusion.gaussian import (
    tensor2complex, tensor2realimag, _randn_like,
)
from dl_swin_gan_tpu.ops.sense import SenseOp


def _diff(steps=50, learn_sigma=False, predict_xstart=True):
    return create_diffusion("", noise_schedule="linear", diffusion_steps=steps,
                            learn_sigma=learn_sigma,
                            predict_xstart=predict_xstart)


def test_linear_schedule_matches_reference_constants():
    betas = get_named_beta_schedule("linear", 1000)
    # the reference's nonstandard beta_end = 0.0008 (gaussian_diffusion.py:122)
    assert np.isclose(betas[0], 1e-4)
    assert np.isclose(betas[-1], 8e-4)
    cos = get_named_beta_schedule("squaredcos_cap_v2", 100)
    assert (cos > 0).all() and (cos <= 0.999).all()


def test_q_sample_statistics():
    d = _diff(100)
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((4, 2, 8, 8))
    t = jnp.array([99] * 4)
    noise = jax.random.normal(key, x0.shape)
    xt = d.q_sample(x0, t, noise)
    # at the last step, signal is scaled by sqrt(alpha_bar_T)
    expected = np.sqrt(d.alphas_cumprod[-1])
    assert np.isclose(float(xt.mean()), expected, atol=0.2)


def test_posterior_identity_at_true_x0():
    """pred_xstart == x0 => posterior mean interpolates correctly."""
    d = _diff(50)
    x0 = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4, 4).astype(np.float32))
    t = jnp.array([10, 30])
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    xt = d.q_sample(x0, t, noise)
    mean, var, logvar = d.q_posterior_mean_variance(x0, xt, t)
    assert mean.shape == x0.shape
    assert np.isfinite(np.asarray(mean)).all()
    # eps roundtrip: predict_xstart_from_eps inverts q_sample
    x0_hat = d._predict_xstart_from_eps(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0),
                               rtol=1e-3, atol=1e-3)


def test_eps_xstart_roundtrip():
    d = _diff(50)
    rng = np.random.RandomState(2)
    xt = jnp.asarray(rng.randn(1, 2, 4, 4).astype(np.float32))
    x0 = jnp.asarray(rng.randn(1, 2, 4, 4).astype(np.float32))
    t = jnp.array([20])
    eps = d._predict_eps_from_xstart(xt, t, x0)
    back = d._predict_xstart_from_eps(xt, t, eps)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0), rtol=1e-3,
                               atol=1e-3)


def test_space_timesteps_ddim():
    s = space_timesteps(1000, "ddim100")
    assert len(s) == 100 and 0 in s
    s2 = space_timesteps(100, [10])
    assert len(s2) == 10


def test_respaced_matches_base_alphas():
    base = _diff(100)
    spaced = create_diffusion("10", diffusion_steps=100, learn_sigma=False,
                              predict_xstart=True)
    kept = sorted(space_timesteps(100, "10"))
    np.testing.assert_allclose(spaced.alphas_cumprod,
                               base.alphas_cumprod[kept], rtol=1e-10)
    # timestep remapping: _wrap_t maps respaced indices to base indices
    t = jnp.arange(len(kept))
    np.testing.assert_array_equal(np.asarray(spaced._wrap_t(t)), kept)


def test_tensor_converters():
    rng = np.random.RandomState(0)
    z = jnp.asarray((rng.randn(2, 3, 4, 4) + 1j * rng.randn(2, 3, 4, 4))
                    .astype(np.complex64))
    ri = tensor2realimag(z)
    assert ri.shape == (2, 6, 4, 4)
    back = tensor2complex(ri)
    np.testing.assert_allclose(np.asarray(back), np.asarray(z))


def test_complex_noise_torch_convention():
    z = jnp.zeros((2000, 4), jnp.complex64)
    n = _randn_like(jax.random.PRNGKey(0), z)
    # torch complex randn: re/im each N(0, 1/2) -> E|z|^2 = 1
    assert np.isclose(float(jnp.mean(jnp.abs(n) ** 2)), 1.0, atol=0.05)


def _sense_problem(make_complex, B=1, E=2, C=3, T=4, Y=8, X=8):
    maps = jnp.asarray(make_complex((B, E, C, 1, Y, X)))
    target = jnp.asarray(make_complex((B, E, T, Y, X)))
    mask = jnp.asarray(
        (np.random.RandomState(5).rand(B, 1, T, Y, X) > 0.5).astype(np.float32))
    return maps, target, mask


def test_training_kspace_loss_and_grad(make_complex):
    d = _diff(20, predict_xstart=True)
    maps, target, mask = _sense_problem(make_complex)
    AF = SenseOp(maps, None)
    kwargs = dict(A=SenseOp(maps, mask), A_1=SenseOp(maps, 1 - mask),
                  A_F=AF, A_S=SenseOp(maps, mask), fs=target,
                  c=jnp.ones((1,), jnp.int32))

    w = jnp.ones((1,), jnp.float32)

    def model(x, t, w=None, **kw):
        return x * w[0]  # trivial learnable model

    def loss(w):
        terms, _, _ = d.training_kspace_loss(
            jax.random.PRNGKey(0),
            lambda x, t, **kw: model(x, t, w=w, **kw),
            target, jnp.array([5]), kwargs)
        return terms["loss"]

    g = jax.grad(loss)(w)
    assert np.isfinite(float(g[0])) and abs(float(g[0])) > 0


def test_conditional_sampling_applies_dc(make_complex):
    """With an identity model, the conditional sampler's output keeps the
    acquired k-space of the init image (all steps > 0 apply hard DC; the
    final t=0 step adds only the posterior mean shift)."""
    d = _diff(5, predict_xstart=True)
    maps, target, mask = _sense_problem(make_complex)
    A = SenseOp(maps, mask)
    init = A(A(target), adjoint=True)  # a consistent zero-filled-ish init
    kwargs = dict(A=A, A_1=SenseOp(maps, 1 - mask), A_F=SenseOp(maps, None),
                  fs=target, c=jnp.ones((1,), jnp.int32))
    model = lambda x, t, **kw: x
    out = d.p_sample_loop_conditional(jax.random.PRNGKey(0), model, init,
                                      kwargs, clip_denoised=False)
    assert out.shape == init.shape
    assert np.isfinite(np.asarray(jnp.abs(out))).all()


def test_training_losses_eps_mode(make_complex):
    d = _diff(20, predict_xstart=False)
    maps, target, mask = _sense_problem(make_complex)
    model = lambda x, t, **kw: x * 0.0  # predicts zero noise
    terms, out, x_t = d.training_losses(jax.random.PRNGKey(0), model, target,
                                        jnp.array([5]))
    # zero prediction vs unit noise target: MSE ~ 1
    assert 0.5 < float(terms["loss"].mean()) < 2.0


def test_learned_sigma_split(make_complex):
    d = create_diffusion("", diffusion_steps=20, learn_sigma=True,
                         predict_xstart=True)
    maps, target, mask = _sense_problem(make_complex)
    # model emits 2x channels (mean + var values)
    model = lambda x, t, **kw: jnp.concatenate([x, 0.0 * x], axis=1)
    terms, out, x_t = d.training_losses(jax.random.PRNGKey(0), model, target,
                                        jnp.array([5]))
    assert "vb" in terms
    assert np.isfinite(float(terms["loss"].mean()))


def test_diffusion_unrolled_learn_sigma(make_complex):
    """learn_sigma gives the FINAL unroll a 2x-channel output
    (unrolledDiT.py:61-83)."""
    from dl_swin_gan_tpu.models.dit import DiTResNet
    from dl_swin_gan_tpu.solvers.diffusion_unrolled import DiffusionUnrolled

    maps, target, mask = _sense_problem(make_complex)
    kspace_kwargs = dict(A=SenseOp(maps, mask), A_1=SenseOp(maps, 1 - mask),
                         A_F=SenseOp(maps, None), fs=target,
                         c=jnp.ones((1,), jnp.int32))

    def make(learn_sigma):
        return DiTResNet(num_emaps=2, hidden_size=24, depth=1, num_heads=2,
                         num_blocks=0, learn_sigma=learn_sigma)

    solver = DiffusionUnrolled(make_denoiser=make, num_unrolls=2,
                               dc_mode="none", learn_sigma=True)
    t = jnp.array([3])
    variables = solver.init(jax.random.PRNGKey(0), target, t, **kspace_kwargs)
    out = solver.apply(variables, target, t, **kspace_kwargs)
    assert out.shape[1] == 2 * target.shape[1]  # mean + var channels


def test_dit_cfg_forward(make_complex):
    from dl_swin_gan_tpu.models.dit import DiT

    net = DiT(in_channels=8, hidden_size=24, depth=1, num_heads=2,
              patch_size=(2, 2, 2))
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 4, 8, 8, 8).astype(np.float32))
    t = jnp.array([3, 3])
    y = jnp.array([0, 1])
    variables = net.init(jax.random.PRNGKey(0), x, t, y)
    out = net.forward_with_cfg(variables, x, t, y, cfg_scale=2.0)
    assert out.shape == x.shape
    # the two halves of the guided eps must be identical
    np.testing.assert_allclose(np.asarray(out[0, ..., :8]),
                               np.asarray(out[1, ..., :8]), rtol=1e-5)


def test_sampling_unroll_reuse_accepts_single_unroll_params():
    """Inference-time unroll reuse: a solver built with SHARE_WEIGHTS=True and
    num_unrolls=K applies the SAME single trained net K times (net -> hard DC,
    K times per reverse step). Its param tree must be identical to the
    1-unroll training-time tree, so quality_row can sweep sampling-time DC
    cadence on a trained checkpoint via config overrides alone
    (MODEL.PARAMETERS.NUM_UNROLLS K MODEL.PARAMETERS.SHARE_WEIGHTS True)."""
    from dl_swin_gan_tpu.solvers.diffusion_unrolled import DiffusionUnrolled
    from dl_swin_gan_tpu.models.latte import LatteNet

    T, Y, X, C, E = 4, 16, 16, 3, 2
    rs = np.random.RandomState(0)
    cplx = lambda *s: (rs.randn(*s) + 1j * rs.randn(*s)).astype(np.complex64)
    x = jnp.asarray(cplx(1, E, T, Y, X))
    maps = jnp.asarray(cplx(1, E, C, 1, Y, X) / 3)
    mask = jnp.asarray((rs.rand(1, T, Y, X) < 0.3).astype(np.float32))
    t = jnp.zeros((1,), jnp.int32)
    kwargs = dict(A=SenseOp(maps, mask), A_1=SenseOp(maps, 1.0 - mask),
                  A_F=SenseOp(maps, None), A_S=SenseOp(maps, mask),
                  c=jnp.ones((1,), jnp.int32))

    mk = lambda learn_sigma: LatteNet(depth=2, hidden_size=48, num_heads=4,
                                      num_emaps=E, learn_sigma=learn_sigma)
    train_time = DiffusionUnrolled(make_denoiser=mk, num_unrolls=1,
                                   dc_mode="dc")
    params = train_time.init(jax.random.PRNGKey(1), x, t, **kwargs)["params"]

    reuse = DiffusionUnrolled(make_denoiser=mk, num_unrolls=2, dc_mode="dc",
                              share_weights=True)
    reuse_tree = reuse.init(jax.random.PRNGKey(1), x, t, **kwargs)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(reuse_tree)

    out1 = train_time.apply({"params": params}, x, t, **kwargs)
    out2 = reuse.apply({"params": params}, x, t, **kwargs)   # same params OK
    assert out2.shape == out1.shape
    assert np.isfinite(np.abs(np.asarray(out2))).all()
