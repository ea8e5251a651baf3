"""Golden parity for the diffusion engine vs the reference
`dl_cs/diffusion/gaussian_diffusion.py` (torch-only — loads without shims):
schedule constants, q_sample, posterior, and p_mean_variance values."""

import sys
import warnings

import numpy as np
import pytest


def _load_ref():
    try:
        sys.path.insert(0, "/root/reference")
        import torch  # noqa: F401
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from dl_cs.diffusion import create_diffusion as ref_create
        return ref_create
    except Exception:
        return None


@pytest.mark.parametrize("sched", ["linear", "squaredcos_cap_v2"])
def test_schedule_constants_match_reference(sched):
    ref_create = _load_ref()
    if ref_create is None:
        pytest.skip("reference/torch unavailable")
    from dl_swin_gan_tpu.diffusion import create_diffusion

    ref = ref_create(timestep_respacing="", noise_schedule=sched,
                     learn_sigma=False, diffusion_steps=1000)
    ours = create_diffusion(timestep_respacing="", noise_schedule=sched,
                            learn_sigma=False, diffusion_steps=1000)
    for name in ("betas", "alphas_cumprod", "posterior_variance",
                 "posterior_mean_coef1", "posterior_mean_coef2",
                 "posterior_log_variance_clipped",
                 "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod"):
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)), np.asarray(getattr(ref, name)),
            rtol=1e-6, atol=1e-12, err_msg=f"{sched}/{name}")


def test_q_sample_and_posterior_match_reference(rng):
    ref_create = _load_ref()
    if ref_create is None:
        pytest.skip("reference/torch unavailable")
    import torch
    import jax.numpy as jnp
    from dl_swin_gan_tpu.diffusion import create_diffusion

    ref = ref_create(timestep_respacing="", noise_schedule="linear",
                     learn_sigma=False, diffusion_steps=1000)
    ours = create_diffusion(timestep_respacing="", noise_schedule="linear",
                            learn_sigma=False, diffusion_steps=1000)

    x0 = rng.standard_normal((2, 4, 6, 8)).astype(np.float32)
    noise = rng.standard_normal(x0.shape).astype(np.float32)
    xt = rng.standard_normal(x0.shape).astype(np.float32)
    t = np.array([17, 801])

    ref_q = ref.q_sample(torch.from_numpy(x0), torch.from_numpy(t),
                         torch.from_numpy(noise)).numpy()
    our_q = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(t),
                                     jnp.asarray(noise)))
    np.testing.assert_allclose(our_q, ref_q, rtol=1e-5, atol=1e-6)

    rm, rv, rlv = ref.q_posterior_mean_variance(
        torch.from_numpy(x0), torch.from_numpy(xt), torch.from_numpy(t))
    om, ov, olv = ours.q_posterior_mean_variance(
        jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(om), rm.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.broadcast_to(np.asarray(ov), rv.shape),
                               rv.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.broadcast_to(np.asarray(olv), rlv.shape),
                               rlv.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("predict_xstart", [False, True])
def test_p_mean_variance_matches_reference(rng, predict_xstart):
    """Deterministic mock model (0.3x + 0.1): full reverse-step mean/variance
    must agree (EPSILON and START_X parameterizations)."""
    ref_create = _load_ref()
    if ref_create is None:
        pytest.skip("reference/torch unavailable")
    import torch
    import jax.numpy as jnp
    from dl_swin_gan_tpu.diffusion import create_diffusion

    ref = ref_create(timestep_respacing="", noise_schedule="linear",
                     learn_sigma=False, predict_xstart=predict_xstart,
                     diffusion_steps=1000)
    ours = create_diffusion(timestep_respacing="", noise_schedule="linear",
                            learn_sigma=False, predict_xstart=predict_xstart,
                            diffusion_steps=1000)

    x = rng.standard_normal((2, 4, 6, 8)).astype(np.float32)
    t = np.array([3, 640])

    ref_out = ref.p_mean_variance(
        lambda v, tt: 0.3 * v + 0.1, torch.from_numpy(x),
        torch.from_numpy(t), clip_denoised=False)
    our_out = ours.p_mean_variance(
        lambda v, tt: 0.3 * v + 0.1, jnp.asarray(x), jnp.asarray(t),
        clip_denoised=False)
    for k in ("mean", "pred_xstart"):
        np.testing.assert_allclose(np.asarray(our_out[k]),
                                   ref_out[k].numpy(), rtol=2e-5, atol=1e-5,
                                   err_msg=k)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(our_out["log_variance"]),
                        ref_out["log_variance"].shape),
        ref_out["log_variance"].numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("predict_xstart", [False, True])
def test_ddim_sample_matches_reference(rng, predict_xstart):
    """DDIM reverse step (eta=0, fully deterministic) and the forward-ODE
    ddim_reverse_sample must match the reference values (eq. 12 terms:
    eps-from-xstart, alpha_bar_prev/next interpolation)
    (`gaussian_diffusion.py:635-721`)."""
    ref_create = _load_ref()
    if ref_create is None:
        pytest.skip("reference/torch unavailable")
    import jax
    import jax.numpy as jnp
    import torch

    from dl_swin_gan_tpu.diffusion import create_diffusion

    ref = ref_create(timestep_respacing="", noise_schedule="linear",
                     learn_sigma=False, predict_xstart=predict_xstart,
                     diffusion_steps=1000)
    ours = create_diffusion(timestep_respacing="", noise_schedule="linear",
                            learn_sigma=False, predict_xstart=predict_xstart,
                            diffusion_steps=1000)

    x = rng.standard_normal((2, 4, 6, 8)).astype(np.float32)
    t = np.array([3, 640])
    model = lambda v, tt: 0.3 * v + 0.1

    ref_out = ref.ddim_sample(model, torch.from_numpy(x),
                              torch.from_numpy(t), clip_denoised=False,
                              eta=0.0)
    our_out = ours.ddim_sample(jax.random.PRNGKey(0), model, jnp.asarray(x),
                               jnp.asarray(t), clip_denoised=False, eta=0.0)
    for k in ("sample", "pred_xstart"):
        np.testing.assert_allclose(np.asarray(our_out[k]),
                                   ref_out[k].numpy(), rtol=2e-5, atol=1e-5,
                                   err_msg=f"ddim_sample {k}")

    ref_rev = ref.ddim_reverse_sample(model, torch.from_numpy(x),
                                      torch.from_numpy(t),
                                      clip_denoised=False)
    our_rev = ours.ddim_reverse_sample(model, jnp.asarray(x), jnp.asarray(t),
                                       clip_denoised=False)
    for k in ("sample", "pred_xstart"):
        np.testing.assert_allclose(np.asarray(our_rev[k]),
                                   ref_rev[k].numpy(), rtol=2e-5, atol=1e-5,
                                   err_msg=f"ddim_reverse_sample {k}")


def test_vb_terms_bpd_matches_reference(rng):
    """VLB term values (normal_kl + discretized Gaussian decoder NLL in
    bits, t==0 switch) against the reference (`gaussian_diffusion.py:
    804-835`); deterministic given (x_start, x_t, t) and a mock model."""
    ref_create = _load_ref()
    if ref_create is None:
        pytest.skip("reference/torch unavailable")
    import jax.numpy as jnp
    import torch

    from dl_swin_gan_tpu.diffusion import create_diffusion

    ref = ref_create(timestep_respacing="", noise_schedule="linear",
                     learn_sigma=False, predict_xstart=False,
                     diffusion_steps=1000)
    ours = create_diffusion(timestep_respacing="", noise_schedule="linear",
                            learn_sigma=False, predict_xstart=False,
                            diffusion_steps=1000)

    x0 = np.tanh(rng.standard_normal((3, 4, 6, 8))).astype(np.float32)
    xt = rng.standard_normal((3, 4, 6, 8)).astype(np.float32)
    t = np.array([0, 17, 640])   # covers the t==0 decoder-NLL branch
    model = lambda v, tt: 0.3 * v + 0.1

    ref_out = ref._vb_terms_bpd(model, torch.from_numpy(x0),
                                torch.from_numpy(xt), torch.from_numpy(t),
                                clip_denoised=False)
    our_out = ours._vb_terms_bpd(model, jnp.asarray(x0), jnp.asarray(xt),
                                 jnp.asarray(t), clip_denoised=False)
    np.testing.assert_allclose(np.asarray(our_out["output"]),
                               ref_out["output"].numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_out["pred_xstart"]),
                               ref_out["pred_xstart"].numpy(), rtol=2e-5,
                               atol=1e-5)


@pytest.mark.parametrize("respacing,n_draws", [("", 8), ("4", 4)])
def test_conditional_sampling_loop_matches_reference(make_complex, rng,
                                                     monkeypatch, respacing,
                                                     n_draws):
    """Value parity for the headline inference path: the full reverse chain
    with hard k-space DC after every step except t=0
    (`p_sample_loop_conditional`, reference :524-632), through REAL SENSE
    operators on complex images. Our per-step ancestral noise sequence is
    precomputed from the jax key schedule and fed to the reference by
    patching torch.randn_like — after that, the two 8-step loops must
    produce the same reconstruction."""
    ref_create = _load_ref()
    if ref_create is None:
        pytest.skip("reference/torch unavailable")
    import jax
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, "/root/reference")
    from dl_cs.mri import transforms as ref_transforms

    from dl_swin_gan_tpu.diffusion import create_diffusion
    from dl_swin_gan_tpu.diffusion.gaussian import _randn_like
    from dl_swin_gan_tpu.ops.sense import SenseOp

    # respacing="4" exercises SpacedDiffusion end to end (timestep remap,
    # rebuilt betas) through the same value-level comparison
    ref = ref_create(timestep_respacing=respacing, noise_schedule="linear",
                     learn_sigma=False, predict_xstart=True,
                     diffusion_steps=8)
    ours = create_diffusion(timestep_respacing=respacing,
                            noise_schedule="linear", learn_sigma=False,
                            predict_xstart=True, diffusion_steps=8)

    B, E, C, T, Y, X = 1, 1, 2, 3, 8, 6
    maps = make_complex((B, E, C, 1, Y, X))
    mask = (rng.random((B, 1, T, Y, X)) < 0.5).astype(np.float32)
    init = make_complex((B, E, T, Y, X))

    model = lambda v, tt, **kw: 0.3 * v + 0.1

    # precompute the exact noise arrays our scan will draw (carry-split
    # key schedule, complex torch-convention normal)
    key = jax.random.PRNGKey(42)
    k = key
    seq = []
    for _ in range(n_draws):
        k, sub = jax.random.split(k)
        seq.append(np.asarray(_randn_like(sub, jnp.asarray(init))))

    our_kwargs = dict(A=SenseOp(jnp.asarray(maps), jnp.asarray(mask)),
                      A_1=SenseOp(jnp.asarray(maps), 1.0 - jnp.asarray(mask)),
                      A_F=SenseOp(jnp.asarray(maps), None))
    out = np.asarray(ours.p_sample_loop_conditional(
        key, model, jnp.asarray(init), our_kwargs, clip_denoised=False))

    pops = [torch.from_numpy(s.copy()) for s in seq]
    monkeypatch.setattr(torch, "randn_like", lambda x, *a, **kw: pops.pop(0))
    tm = torch.from_numpy(maps)
    ref_kwargs = dict(
        A=ref_transforms.SenseModel(tm, weights=torch.from_numpy(mask)),
        A_1=ref_transforms.SenseModel(tm, weights=torch.from_numpy(1 - mask)),
        A_F=ref_transforms.SenseModel(tm))

    class Stub(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.p = torch.nn.Parameter(torch.zeros(1))

        def forward(self, v, tt, **kw):
            return 0.3 * v + 0.1

    ref_out = ref.p_sample_loop_conditional(
        Stub(), tuple(init.shape), noise=torch.from_numpy(init.copy()),
        clip_denoised=False, model_kwargs=ref_kwargs).numpy()
    assert not pops, "reference loop drew fewer noise samples than ours"

    np.testing.assert_allclose(out, ref_out, rtol=1e-4,
                               atol=1e-5 * np.abs(ref_out).max())


def test_calc_bpd_loop_matches_reference(rng, monkeypatch):
    """Full-VLB bits/dim loop (reference :983-1037): per-t q_sample noise is
    synchronized by precomputing our scan's draws and patching
    torch.randn_like; total/prior/per-t vb and both MSE tracks must match."""
    ref_create = _load_ref()
    if ref_create is None:
        pytest.skip("reference/torch unavailable")
    import jax
    import jax.numpy as jnp
    import torch

    from dl_swin_gan_tpu.diffusion import create_diffusion

    steps = 6
    ref = ref_create(timestep_respacing="", noise_schedule="linear",
                     learn_sigma=False, predict_xstart=False,
                     diffusion_steps=steps)
    ours = create_diffusion(timestep_respacing="", noise_schedule="linear",
                            learn_sigma=False, predict_xstart=False,
                            diffusion_steps=steps)

    x0 = np.tanh(rng.standard_normal((2, 4, 6, 8))).astype(np.float32)
    model = lambda v, tt, **kw: 0.3 * v + 0.1

    key = jax.random.PRNGKey(9)
    k = key
    seq = []
    for _ in range(steps):
        k, sub = jax.random.split(k)
        seq.append(np.asarray(jax.random.normal(sub, x0.shape, jnp.float32)))

    our_out = ours.calc_bpd_loop(key, model, jnp.asarray(x0),
                                 clip_denoised=False)

    pops = [torch.from_numpy(s.copy()) for s in seq]
    monkeypatch.setattr(torch, "randn_like", lambda x, *a, **kw: pops.pop(0))
    ref_out = ref.calc_bpd_loop(model, torch.from_numpy(x0),
                                clip_denoised=False)
    assert not pops

    for k2 in ("total_bpd", "prior_bpd"):
        np.testing.assert_allclose(np.asarray(our_out[k2]),
                                   ref_out[k2].numpy(), rtol=1e-4,
                                   atol=1e-5, err_msg=k2)
    # ours stacks over the scan axis [T, N] (t = T-1 first); reference
    # stacks dim=1 -> [N, T] in the same t order
    for k2 in ("vb", "xstart_mse", "mse"):
        np.testing.assert_allclose(np.asarray(our_out[k2]).T,
                                   ref_out[k2].numpy(), rtol=1e-4,
                                   atol=1e-5, err_msg=k2)
