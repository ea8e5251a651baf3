"""Gaussian diffusion (schedules, q/p, DDIM, conditional-DC sampling, losses).

TPU-native counterpart of reference `dl_cs/diffusion/gaussian_diffusion.py`
(OpenAI ADM/IDDPM adapted to complex images). Faithfully preserved quirks:

  - the "linear" schedule uses beta_end = scale*0.0008, NOT the standard
    0.02 (reference :114-124)
  - training noise lives in the stacked real/imag representation
    (tensor2realimag, :15-22) while the model consumes complex arrays
  - sampling runs on complex arrays with torch-style complex normal noise
    (re/im each N(0, 1/2)) — the reference's p_sample draws randn_like on a
    complex tensor (:421)
  - `p_sample_loop_conditional` applies hard data consistency
    sample <- A_F^H(A_1(sample) + A(init_img)) after every step except t=0
    (:609-632)
  - `training_kspace_loss` is an L1 between full-k-space projections of the
    model output and the fully-sampled target (:837-873)

Sampling loops are lax.scan over the (static) respaced timestep sequence —
one compiled program for the whole 100/1000-step chain.
"""

import enum
import math
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- enums

class ModelMeanType(enum.Enum):
    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


# ---------------------------------------------------------------- schedules

def get_beta_schedule(name: str, *, beta_start, beta_end, num_steps) -> np.ndarray:
    if name == "quad":
        return np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_steps,
                           dtype=np.float64) ** 2
    if name == "linear":
        return np.linspace(beta_start, beta_end, num_steps, dtype=np.float64)
    if name == "const":
        return beta_end * np.ones(num_steps, dtype=np.float64)
    if name == "jsd":
        return 1.0 / np.linspace(num_steps, 1, num_steps, dtype=np.float64)
    raise NotImplementedError(name)


def betas_for_alpha_bar(num_steps: int, alpha_bar, max_beta: float = 0.999):
    betas = []
    for i in range(num_steps):
        t1, t2 = i / num_steps, (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    if name == "linear":
        scale = 1000 / num_steps
        # reference uses beta_end = scale*0.0008 (gaussian_diffusion.py:122)
        return get_beta_schedule("linear", beta_start=scale * 0.0001,
                                 beta_end=scale * 0.0008, num_steps=num_steps)
    if name == "squaredcos_cap_v2":
        return betas_for_alpha_bar(
            num_steps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2)
    raise NotImplementedError(f"unknown beta schedule: {name}")


# ---------------------------------------------------------------- helpers

def tensor2realimag(x: jnp.ndarray) -> jnp.ndarray:
    """[N, C, ...] complex -> [N, 2C, ...] float (reference :15-17)."""
    return jnp.concatenate([x.real, x.imag], axis=1)


def tensor2complex(x: jnp.ndarray) -> jnp.ndarray:
    """[N, 2C, ...] float -> [N, C, ...] complex (reference :19-22)."""
    c = x.shape[1]
    return jax.lax.complex(x[:, :c // 2], x[:, c // 2:])


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    v = jnp.abs(x) if jnp.iscomplexobj(x) else x
    return v.reshape(v.shape[0], -1).mean(axis=1)


def _randn_like(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Standard normal for real arrays; torch-style complex normal
    (re/im each N(0, 1/2)) for complex arrays."""
    if jnp.iscomplexobj(x):
        k1, k2 = jax.random.split(key)
        re = jax.random.normal(k1, x.shape, jnp.float32) / np.sqrt(2.0)
        im = jax.random.normal(k2, x.shape, jnp.float32) / np.sqrt(2.0)
        return jax.lax.complex(re, im)
    return jax.random.normal(key, x.shape, x.dtype)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal Gaussians (reference diffusion_utils.py:10-31)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a 1/255-discretized Gaussian
    (reference diffusion_utils.py:44-88)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, 1e-12))))


# ---------------------------------------------------------------- engine

class GaussianDiffusion:
    """Schedule arrays are numpy (trace-time constants); methods operate on
    jnp arrays (real stacked-channel or complex) under jit."""

    def __init__(self, *, betas, model_mean_type: ModelMeanType,
                 model_var_type: ModelVarType, loss_type: LossType):
        self.model_mean_type = model_mean_type
        self.model_var_type = model_var_type
        self.loss_type = loss_type

        betas = np.array(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        self.betas = betas
        self.num_timesteps = int(betas.shape[0])

        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas, axis=0)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])
        self.alphas_cumprod_next = np.append(self.alphas_cumprod[1:], 0.0)

        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)
        self.log_one_minus_alphas_cumprod = np.log(1.0 - self.alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod - 1)

        self.posterior_variance = (
            betas * (1.0 - self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod))
        self.posterior_log_variance_clipped = (
            np.log(np.append(self.posterior_variance[1], self.posterior_variance[1:]))
            if len(self.posterior_variance) > 1 else np.array([]))
        self.posterior_mean_coef1 = (
            betas * np.sqrt(self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod))
        self.posterior_mean_coef2 = (
            (1.0 - self.alphas_cumprod_prev) * np.sqrt(alphas)
            / (1.0 - self.alphas_cumprod))

    # -- utilities --------------------------------------------------------
    @staticmethod
    def _extract(arr: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        out = jnp.take(jnp.asarray(arr, jnp.float32), t)
        return out.reshape((-1,) + (1,) * (ndim - 1))

    def _wrap_t(self, t):
        """Hook for SpacedDiffusion timestep remapping."""
        return t

    # -- q ------------------------------------------------------------------
    def q_mean_variance(self, x_start, t):
        nd = x_start.ndim
        mean = self._extract(self.sqrt_alphas_cumprod, t, nd) * x_start
        variance = self._extract(1.0 - self.alphas_cumprod, t, nd)
        log_variance = self._extract(self.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        nd = x_start.ndim
        return (self._extract(self.sqrt_alphas_cumprod, t, nd) * x_start
                + self._extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise)

    def q_posterior_mean_variance(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (self._extract(self.posterior_mean_coef1, t, nd) * x_start
                + self._extract(self.posterior_mean_coef2, t, nd) * x_t)
        variance = self._extract(self.posterior_variance, t, nd)
        log_variance = self._extract(self.posterior_log_variance_clipped, t, nd)
        return mean, variance, log_variance

    # -- p ------------------------------------------------------------------
    def _predict_xstart_from_eps(self, x_t, t, eps):
        nd = x_t.ndim
        return (self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
                - self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps)

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        nd = x_t.ndim
        return ((self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
                 - pred_xstart)
                / self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd))

    def p_mean_variance(self, model: Callable, x, t, clip_denoised: bool = True,
                        denoised_fn=None, model_kwargs: Optional[dict] = None
                        ) -> Dict[str, jnp.ndarray]:
        """Reference :265-343. `model(x, t, **kwargs)`; x may be complex."""
        model_kwargs = model_kwargs or {}
        nd = x.ndim
        C = x.shape[1]
        model_output = model(x, self._wrap_t(t), **model_kwargs)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, var_values = jnp.split(model_output, 2, axis=1)
            if jnp.iscomplexobj(var_values):
                var_values = var_values.real
            min_log = self._extract(self.posterior_log_variance_clipped, t, nd)
            max_log = self._extract(np.log(self.betas), t, nd)
            frac = (var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
        else:
            variance, log_variance = {
                ModelVarType.FIXED_LARGE: (
                    np.append(self.posterior_variance[1], self.betas[1:]),
                    np.log(np.append(self.posterior_variance[1], self.betas[1:]))),
                ModelVarType.FIXED_SMALL: (
                    self.posterior_variance,
                    self.posterior_log_variance_clipped),
            }[self.model_var_type]
            model_variance = self._extract(variance, t, nd)
            model_log_variance = self._extract(log_variance, t, nd)

        def process_xstart(v):
            if denoised_fn is not None:
                v = denoised_fn(v)
            if clip_denoised and not jnp.iscomplexobj(v):
                return jnp.clip(v, -1, 1)
            return v

        if self.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
        else:
            pred_xstart = process_xstart(
                self._predict_xstart_from_eps(x_t=x, t=t, eps=model_output))
        model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {"mean": model_mean, "variance": model_variance,
                "log_variance": model_log_variance, "pred_xstart": pred_xstart}

    def p_sample(self, key, model, x, t, clip_denoised=True, denoised_fn=None,
                 model_kwargs=None):
        """Ancestral sampling step (reference :387-428)."""
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn,
                                   model_kwargs)
        noise = _randn_like(key, x)
        nonzero = (t != 0).astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def _scan_indices(self):
        return np.arange(self.num_timesteps)[::-1].copy()

    def p_sample_loop(self, key, model, shape=None, noise=None,
                      clip_denoised=True, denoised_fn=None, model_kwargs=None):
        """Full reverse chain under lax.scan (reference :431-522)."""
        if noise is None:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, shape, jnp.float32)
        img = noise

        def step(carry, i):
            img, key = carry
            key, sub = jax.random.split(key)
            t = jnp.full((img.shape[0],), i, jnp.int32)
            out = self.p_sample(sub, model, img, t, clip_denoised, denoised_fn,
                                model_kwargs)
            return (out["sample"], key), None

        (img, _), _ = jax.lax.scan(step, (img, key),
                                   jnp.asarray(self._scan_indices()))
        return img

    def p_sample_loop_conditional(self, key, model, noise, model_kwargs,
                                  clip_denoised=False, denoised_fn=None):
        """Reverse chain with hard k-space data consistency after every step
        except t=0 (reference :524-632). `noise` is the zero-filled init
        image (complex); model_kwargs must hold A, A_1, A_F SenseOps."""
        A_F = model_kwargs["A_F"]
        A_1 = model_kwargs["A_1"]
        A = model_kwargs["A"]
        init_img = noise
        # the model receives ALL kwargs, operators included — the reference
        # protocol (unrolledDiT forwards A/A_1/A_F/A_S/fs to the solver)
        inner_kwargs = model_kwargs

        def step(carry, i):
            img, key = carry
            key, sub = jax.random.split(key)
            t = jnp.full((img.shape[0],), i, jnp.int32)
            out = self.p_sample(sub, model, img, t, clip_denoised, denoised_fn,
                                inner_kwargs)
            sample = out["sample"]
            # hard DC: acquired lines from init_img, rest from the model
            dc = A_F(A_1(sample) + A(init_img), adjoint=True)
            sample = jnp.where(i != 0, dc, sample)
            return (sample, key), None

        (img, _), _ = jax.lax.scan(step, (init_img, key),
                                   jnp.asarray(self._scan_indices()))
        return img

    # -- DDIM -----------------------------------------------------------------
    def ddim_sample(self, key, model, x, t, clip_denoised=True, denoised_fn=None,
                    model_kwargs=None, eta=0.0):
        """Reference :635-682 (eq. 12)."""
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn,
                                   model_kwargs)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        nd = x.ndim
        alpha_bar = self._extract(self.alphas_cumprod, t, nd)
        alpha_bar_prev = self._extract(self.alphas_cumprod_prev, t, nd)
        sigma = (eta * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
                 * jnp.sqrt(1 - alpha_bar / alpha_bar_prev))
        noise = _randn_like(key, x)
        mean_pred = (out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
                     + jnp.sqrt(1 - alpha_bar_prev - sigma ** 2) * eps)
        nonzero = (t != 0).astype(jnp.float32).reshape((-1,) + (1,) * (nd - 1))
        sample = mean_pred + nonzero * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(self, model, x, t, clip_denoised=True,
                            denoised_fn=None, model_kwargs=None):
        """Deterministic forward ODE (reference :684-721)."""
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn,
                                   model_kwargs)
        nd = x.ndim
        eps = ((self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x
                - out["pred_xstart"])
               / self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd))
        alpha_bar_next = self._extract(self.alphas_cumprod_next, t, nd)
        mean_pred = (out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
                     + jnp.sqrt(1 - alpha_bar_next) * eps)
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(self, key, model, shape=None, noise=None,
                         clip_denoised=True, denoised_fn=None,
                         model_kwargs=None, eta=0.0):
        if noise is None:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, shape, jnp.float32)

        def step(carry, i):
            img, key = carry
            key, sub = jax.random.split(key)
            t = jnp.full((img.shape[0],), i, jnp.int32)
            out = self.ddim_sample(sub, model, img, t, clip_denoised,
                                   denoised_fn, model_kwargs, eta)
            return (out["sample"], key), None

        (img, _), _ = jax.lax.scan(step, (noise, key),
                                   jnp.asarray(self._scan_indices()))
        return img

    # -- VLB / losses -----------------------------------------------------------
    def _vb_terms_bpd(self, model, x_start, x_t, t, clip_denoised=True,
                      model_kwargs=None):
        """Reference :804-835 (bits, not nats)."""
        true_mean, _, true_logvar = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model, x_t, t, clip_denoised,
                                   model_kwargs=model_kwargs)
        kl = normal_kl(true_mean, true_logvar, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"])
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_kspace_loss(self, key, model, x_start, t, model_kwargs):
        """DDPM_X k-space L1 loss (reference :837-873).

        x_start: complex [N, E, T, Y, X] fully-sampled target.
        Returns (terms, im_output, x_t_complex).
        """
        x_ri = tensor2realimag(x_start)
        noise = jax.random.normal(key, x_ri.shape, x_ri.dtype)
        x_t = self.q_sample(x_ri, t, noise)
        x_t = tensor2complex(x_t)

        im_output = model(x_t, self._wrap_t(t), **model_kwargs)

        target = model_kwargs["fs"]
        A_F = model_kwargs["A_F"]
        ks_out = A_F(im_output)
        ks_ref = A_F(target)
        l1 = jnp.mean(jnp.abs(ks_out - ks_ref))
        terms = {"l1": l1, "MSE": l1, "loss": l1}
        return terms, im_output, x_t

    def training_losses(self, key, model, x_start, t, model_kwargs=None):
        """Standard eps/x0 MSE with complex<->real conversions
        (reference :876-964). Returns (terms, model_output_c, x_t_c)."""
        model_kwargs = model_kwargs or {}
        x_ri = tensor2realimag(x_start)
        noise = jax.random.normal(key, x_ri.shape, x_ri.dtype)
        x_t_ri = self.q_sample(x_ri, t, noise)
        x_t_c = tensor2complex(x_t_ri)

        terms = {}
        if self.loss_type.is_vb():
            def wrapped(v, tt, **kw):
                return tensor2realimag(model(tensor2complex(v), tt, **kw))
            terms["loss"] = self._vb_terms_bpd(
                lambda v, tt, **kw: wrapped(v, self._wrap_t(tt), **kw),
                x_ri, x_t_ri, t, clip_denoised=False,
                model_kwargs=model_kwargs)["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms, None, x_t_c

        model_output = model(x_t_c, self._wrap_t(t), **model_kwargs)
        model_output = tensor2realimag(model_output)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            C = x_t_ri.shape[1]
            model_output, var_values = jnp.split(model_output, 2, axis=1)
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), var_values], axis=1)
            terms["vb"] = self._vb_terms_bpd(
                lambda *a, **kw: frozen, x_ri, x_t_ri, t,
                clip_denoised=False)["output"]
            if self.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            target = self.q_posterior_mean_variance(x_ri, x_t_ri, t)[0]
        elif self.model_mean_type == ModelMeanType.START_X:
            target = x_ri
        else:
            target = noise
        terms["mse"] = mean_flat((target - model_output) ** 2)
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]

        return terms, tensor2complex(model_output), x_t_c

    def _prior_bpd(self, x_start):
        t = jnp.full((x_start.shape[0],), self.num_timesteps - 1, jnp.int32)
        qt_mean, _, qt_logvar = self.q_mean_variance(x_start, t)
        kl = normal_kl(qt_mean, qt_logvar, 0.0, 0.0)
        return mean_flat(kl) / np.log(2.0)

    def calc_bpd_loop(self, key, model, x_start, clip_denoised=True,
                      model_kwargs=None):
        """Full VLB in bits/dim (reference :983-1037), scanned over t."""
        B = x_start.shape[0]

        def step(key, i):
            key, sub = jax.random.split(key)
            t = jnp.full((B,), i, jnp.int32)
            noise = jax.random.normal(sub, x_start.shape, x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
            out = self._vb_terms_bpd(model, x_start, x_t, t, clip_denoised,
                                     model_kwargs)
            eps = self._predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            return key, (out["output"],
                         mean_flat((out["pred_xstart"] - x_start) ** 2),
                         mean_flat((eps - noise) ** 2))

        _, (vb, xstart_mse, eps_mse) = jax.lax.scan(
            step, key, jnp.asarray(self._scan_indices()))
        prior_bpd = self._prior_bpd(x_start)
        total_bpd = vb.sum(axis=0) + prior_bpd
        return {"total_bpd": total_bpd, "prior_bpd": prior_bpd, "vb": vb,
                "xstart_mse": xstart_mse, "mse": eps_mse}
