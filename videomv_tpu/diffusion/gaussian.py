"""Gaussian diffusion algebra as pure JAX functions over a constants pytree.

Functional re-design of the reference ``DiffusionDDIM``
(/root/reference/tools/modules/diffusions/diffusion_ddim.py:18-527): all
per-timestep constants live in a ``DiffusionParams`` pytree computed once at
build time; every operation (``q_sample``, ``p_mean_variance``, losses, VLB)
is a pure function suitable for ``jax.jit`` / ``lax.scan``.  The denoiser is
passed in as a callable ``model_fn(xt, t) -> prediction`` so that guidance and
sampler loops stay model-agnostic.

Supported parameterizations: mean_type in {'eps','x0','x_{t-1}','v'};
var_type in {'learned','learned_range','fixed_large','fixed_small'};
loss_type in {'mse','rescaled_mse','l1','rescaled_l1','kl','rescaled_kl',
'charbonnier'} — matching the reference assertion set (diffusion_ddim.py:32-34).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .schedules import beta_schedule

__all__ = ["DiffusionParams", "GaussianDiffusion"]


def _bcast(vec: jnp.ndarray, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Gather ``vec[t]`` and broadcast to the batch-shape of ``x``.

    Equivalent of the reference ``_i`` helper (diffusion_ddim.py:9-15) but
    jit-friendly: gathers stay on-device and reshape to (B, 1, 1, ...).
    """
    out = jnp.take(vec, t, axis=0).astype(x.dtype)
    return out.reshape(t.shape + (1,) * (x.ndim - 1))


@struct.dataclass
class DiffusionParams:
    """Per-timestep diffusion constants (all shape [T], float32)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(cls, betas: np.ndarray) -> "DiffusionParams":
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.min() > 0 and betas.max() <= 1
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
        alphas_cumprod_next = np.concatenate([alphas_cumprod[1:], [0.0]])

        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls._create_arrays(cls, betas, alphas, alphas_cumprod,
                                  alphas_cumprod_prev, alphas_cumprod_next,
                                  posterior_variance, f32)

    @staticmethod
    def _create_arrays(cls, betas, alphas, alphas_cumprod, alphas_cumprod_prev,
                       alphas_cumprod_next, posterior_variance, f32):
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            alphas_cumprod_next=f32(alphas_cumprod_next),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            # zero-terminal-SNR schedules have alphas_cumprod[-1] == 0 and
            # the raw reciprocals are inf there (the reference torch code
            # keeps the infs and NaNs whenever a DDIM step sequence includes
            # t = T-1, e.g. ddim_timesteps that don't divide T — a latent
            # reference bug). Clamping acp in the reciprocals recovers the
            # exact limit instead: x0_to_eps -> (xt - ~0·x0) -> xt as
            # acp -> 0, which is the correct eps at pure noise. Entries with
            # acp ≥ 1e-12 (every non-terminal index) are bit-unchanged.
            sqrt_recip_alphas_cumprod=f32(
                np.sqrt(1.0 / np.maximum(alphas_cumprod, 1e-12))),
            sqrt_recipm1_alphas_cumprod=f32(
                np.sqrt(1.0 / np.maximum(alphas_cumprod, 1e-12) - 1.0)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
        )


class GaussianDiffusion:
    """Gaussian diffusion process: schedules, sampling algebra, and losses.

    Static configuration object (hashable, safe to close over in jit).  All
    state lives in the ``DiffusionParams`` pytree at ``self.params``.
    """

    def __init__(
        self,
        schedule: str = "linear_sd",
        schedule_param: Optional[dict] = None,
        mean_type: str = "eps",
        var_type: str = "fixed_small",
        loss_type: str = "mse",
        epsilon: float = 1e-12,
        rescale_timesteps: bool = False,
        noise_strength: float = 0.0,
        **kwargs,
    ):
        assert mean_type in {"x0", "x_{t-1}", "eps", "v"}
        assert var_type in {"learned", "learned_range", "fixed_large", "fixed_small"}
        assert loss_type in {
            "mse", "rescaled_mse", "kl", "rescaled_kl", "l1", "rescaled_l1", "charbonnier",
        }
        schedule_param = dict(schedule_param or {})
        betas = beta_schedule(schedule, **schedule_param)
        self.schedule = schedule
        self.params = DiffusionParams.create(betas)
        self.num_timesteps = int(self.params.num_timesteps)
        self.mean_type = mean_type
        self.var_type = var_type
        self.loss_type = loss_type
        self.epsilon = epsilon
        self.rescale_timesteps = rescale_timesteps
        self.noise_strength = noise_strength

    # ------------------------------------------------------------------ q(.)

    def sample_noise(self, rng: jax.Array, x0: jnp.ndarray) -> jnp.ndarray:
        """Gaussian noise with optional per-frame offset noise
        (reference ``sample_loss``, diffusion_ddim.py:71-78)."""
        noise = jax.random.normal(rng, x0.shape, x0.dtype)
        if self.noise_strength > 0:
            off_rng = jax.random.fold_in(rng, 1)
            b, c, f = x0.shape[:3]
            offset = jax.random.normal(off_rng, (b, c, f) + (1,) * (x0.ndim - 3), x0.dtype)
            noise = noise + self.noise_strength * offset
        return noise

    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Sample from q(x_t | x_0)."""
        p = self.params
        return (
            _bcast(p.sqrt_alphas_cumprod, t, x0) * x0
            + _bcast(p.sqrt_one_minus_alphas_cumprod, t, x0) * noise
        )

    def q_mean_variance(self, x0, t):
        p = self.params
        mu = _bcast(p.sqrt_alphas_cumprod, t, x0) * x0
        var = _bcast(1.0 - p.alphas_cumprod, t, x0)
        log_var = _bcast(p.log_one_minus_alphas_cumprod, t, x0)
        return mu, var, log_var

    def q_posterior_mean_variance(self, x0, xt, t):
        p = self.params
        mu = _bcast(p.posterior_mean_coef1, t, xt) * x0 + _bcast(p.posterior_mean_coef2, t, xt) * xt
        var = _bcast(p.posterior_variance, t, xt)
        log_var = _bcast(p.posterior_log_variance_clipped, t, xt)
        return mu, var, log_var

    # ------------------------------------------------------- prediction math

    def pred_to_x0(self, out: jnp.ndarray, xt: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Convert the model's raw prediction (per ``mean_type``) to x0."""
        p = self.params
        if self.mean_type == "x0":
            return out
        if self.mean_type == "eps":
            return (
                _bcast(p.sqrt_recip_alphas_cumprod, t, xt) * xt
                - _bcast(p.sqrt_recipm1_alphas_cumprod, t, xt) * out
            )
        if self.mean_type == "v":
            return (
                _bcast(p.sqrt_alphas_cumprod, t, xt) * xt
                - _bcast(p.sqrt_one_minus_alphas_cumprod, t, xt) * out
            )
        if self.mean_type == "x_{t-1}":
            return (
                _bcast(1.0 / p.posterior_mean_coef1, t, xt) * out
                - _bcast(p.posterior_mean_coef2 / p.posterior_mean_coef1, t, xt) * xt
            )
        raise ValueError(self.mean_type)

    def x0_to_eps(self, x0: jnp.ndarray, xt: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        p = self.params
        return (
            _bcast(p.sqrt_recip_alphas_cumprod, t, xt) * xt - x0
        ) / _bcast(p.sqrt_recipm1_alphas_cumprod, t, xt)

    def target(self, x0, xt, t, noise):
        """Regression target for the configured ``mean_type``."""
        p = self.params
        if self.mean_type == "eps":
            return noise
        if self.mean_type == "x0":
            return x0
        if self.mean_type == "x_{t-1}":
            return self.q_posterior_mean_variance(x0, xt, t)[0]
        if self.mean_type == "v":
            return (
                _bcast(p.sqrt_alphas_cumprod, t, xt) * noise
                - _bcast(p.sqrt_one_minus_alphas_cumprod, t, xt) * x0
            )
        raise ValueError(self.mean_type)

    def scale_timesteps(self, t):
        if self.rescale_timesteps:
            return t.astype(jnp.float32) * 1000.0 / self.num_timesteps
        return t

    # ------------------------------------------------------------------ p(.)

    def _split_variance(self, out, xt, t):
        """Split/compute variance from raw model output per ``var_type``."""
        p = self.params
        if self.var_type == "learned":
            out, log_var = jnp.split(out, 2, axis=1)
            var = jnp.exp(log_var)
        elif self.var_type == "learned_range":
            out, fraction = jnp.split(out, 2, axis=1)
            min_log = _bcast(p.posterior_log_variance_clipped, t, xt)
            max_log = _bcast(jnp.log(p.betas), t, xt)
            fraction = (fraction + 1) / 2.0
            log_var = fraction * max_log + (1 - fraction) * min_log
            var = jnp.exp(log_var)
        elif self.var_type == "fixed_large":
            var = _bcast(
                jnp.concatenate([p.posterior_variance[1:2], p.betas[1:]]), t, xt
            )
            log_var = jnp.log(var)
        elif self.var_type == "fixed_small":
            var = _bcast(p.posterior_variance, t, xt)
            log_var = _bcast(p.posterior_log_variance_clipped, t, xt)
        else:
            raise ValueError(self.var_type)
        return out, var, log_var

    def p_mean_variance(
        self,
        model_fn: Callable[..., jnp.ndarray],
        xt: jnp.ndarray,
        t: jnp.ndarray,
        guide_scale: Optional[float] = None,
        clamp: Optional[float] = None,
        percentile: Optional[float] = None,
        prediction_is_x0: bool = False,
    ):
        """Distribution of p(x_{t-1} | x_t).

        ``model_fn(xt, t)`` returns either the raw prediction (no guidance) or,
        when ``guide_scale`` is set, a pair ``(cond, uncond)`` of predictions;
        guidance mixes them as ``u + s·(c − u)`` on the mean channels
        (reference diffusion_ddim.py:149-160).

        ``prediction_is_x0`` marks the GS-refine path where the model returns a
        latent x0 substitute directly (reference diffusion_ddim.py:180-182).
        """
        if guide_scale is None:
            out = model_fn(xt, self.scale_timesteps(t))
            out, var, log_var = self._split_variance(out, xt, t)
        else:
            y_out, u_out = model_fn(xt, self.scale_timesteps(t))
            dim = y_out.shape[1] if self.var_type.startswith("fixed") else y_out.shape[1] // 2
            mixed = u_out[:, :dim] + guide_scale * (y_out[:, :dim] - u_out[:, :dim])
            out = jnp.concatenate([mixed, y_out[:, dim:]], axis=1)
            out, var, log_var = self._split_variance(out, xt, t)

        if prediction_is_x0:
            x0 = out
        else:
            x0 = self.pred_to_x0(out, xt, t)

        if percentile is not None:
            assert 0 < percentile <= 1
            flat = jnp.abs(x0.reshape(x0.shape[0], -1))
            s = jnp.quantile(flat, percentile, axis=1)
            s = jnp.maximum(s, 1.0).reshape((-1,) + (1,) * (x0.ndim - 1))
            x0 = jnp.clip(x0, -s, s) / s
        elif clamp is not None:
            x0 = jnp.clip(x0, -clamp, clamp)

        mu, _, _ = self.q_posterior_mean_variance(x0, xt, t)
        return mu, var, log_var, x0

    # ---------------------------------------------------------------- losses

    def loss(
        self,
        rng: jax.Array,
        model_fn: Callable[..., Any],
        x0: jnp.ndarray,
        t: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
        weight: Optional[jnp.ndarray] = None,
        use_div_loss: bool = False,
    ):
        """Per-sample training loss (reference diffusion_ddim.py:377-466).

        Returns ``(loss[B], aux)`` where aux carries xt/target for logging.
        The LGM-refine loss variant (where the model itself returns a loss
        dict) is handled at the engine level, not here.
        """
        noise_rng, _ = jax.random.split(rng)
        if noise is None:
            noise = self.sample_noise(noise_rng, x0)
        xt = self.q_sample(x0, t, noise)

        out = model_fn(xt, self.scale_timesteps(t))

        loss_vlb = 0.0
        if self.var_type in ("learned", "learned_range"):
            out, var = jnp.split(out, 2, axis=1)
            frozen = jnp.concatenate([jax.lax.stop_gradient(out), var], axis=1)
            loss_vlb, _ = self.variational_lower_bound(
                x0, xt, t, model_fn=lambda *a, **k: frozen
            )
            if self.loss_type.startswith("rescaled_"):
                loss_vlb = loss_vlb * self.num_timesteps / 1000.0

        if self.loss_type == "charbonnier":
            target = self.target(x0, xt, t, noise)
            err = jnp.sqrt((out - target) ** 2 + self.epsilon)
            if weight is not None:
                err = err * weight
            loss = err.reshape(err.shape[0], -1).mean(axis=1)
        else:
            target = self.target(x0, xt, t, noise)
            power = 1 if self.loss_type.endswith("l1") else 2
            err = jnp.abs(out - target) ** power
            loss = err.reshape(err.shape[0], -1).mean(axis=1)
            if weight is not None:
                loss = loss * weight

            if use_div_loss and self.mean_type == "eps" and x0.shape[2] > 1:
                # diversity regularizer over the frame axis
                x0_ = self.pred_to_x0(out, xt, t)
                div = 0.001 / (
                    x0_.std(axis=2).reshape(x0.shape[0], -1).mean(axis=1) + 1e-4
                )
                loss = loss + div

        loss = loss + loss_vlb
        return loss, {"xt": xt, "pred": out, "noise": noise}

    # ------------------------------------------------------------------- VLB

    def variational_lower_bound(self, x0, xt, t, model_fn, clamp=None, percentile=None):
        mu1, _, log_var1 = self.q_posterior_mean_variance(x0, xt, t)
        mu2, _, log_var2, pred_x0 = self.p_mean_variance(
            model_fn, xt, t, clamp=clamp, percentile=percentile
        )
        kl = kl_divergence(mu1, log_var1, mu2, log_var2)
        kl = kl.reshape(kl.shape[0], -1).mean(axis=1) / math.log(2.0)

        nll = -discretized_gaussian_log_likelihood(x0, mean=mu2, log_scale=0.5 * log_var2)
        nll = nll.reshape(nll.shape[0], -1).mean(axis=1) / math.log(2.0)

        vlb = jnp.where(t == 0, nll, kl)
        return vlb, pred_x0


# ------------------------------------------------------------------- helpers
# (reference tools/modules/diffusions/losses.py)


def kl_divergence(mu1, log_var1, mu2, log_var2):
    return 0.5 * (
        -1.0
        + log_var2
        - log_var1
        + jnp.exp(log_var1 - log_var2)
        + ((mu1 - mu2) ** 2) * jnp.exp(-log_var2)
    )


def standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x0, mean, log_scale):
    """Log-likelihood of x0 under a Gaussian discretized to 1/255 bins."""
    centered_x = x0 - mean
    inv_stdv = jnp.exp(-log_scale)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, a_min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, a_min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x0 < -0.999,
        log_cdf_plus,
        jnp.where(x0 > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, a_min=1e-12))),
    )
    return log_probs
