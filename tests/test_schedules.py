"""Schedule math vs closed forms (SURVEY.md §4 test strategy)."""

import math

import numpy as np
import pytest

from videomv_tpu.diffusion.schedules import (
    beta_schedule,
    cosine_schedule,
    karras_sigmas,
    linear_sd_schedule,
    logsnr_cosine_interp_schedule,
    rescale_zero_terminal_snr,
)


def test_linear_sd_endpoints():
    # t2v_train.yaml uses linear_sd with init 8.5e-4, last 1.2e-2
    betas = linear_sd_schedule(1000, 0.00085, 0.0120)
    assert betas.shape == (1000,)
    assert math.isclose(betas[0], 0.00085, rel_tol=1e-12)
    assert math.isclose(betas[-1], 0.0120, rel_tol=1e-12)
    # linear in sqrt-space
    sq = np.sqrt(betas)
    diffs = np.diff(sq)
    assert np.allclose(diffs, diffs[0])


def test_cosine_schedule_properties():
    betas = cosine_schedule(1000)
    assert betas.shape == (1000,)
    assert betas.min() > 0
    assert betas.max() <= 0.999
    # monotonically increasing alphas_cumprod decay
    acp = np.cumprod(1 - betas)
    assert np.all(np.diff(acp) < 0)
    # closed form: alphas_cumprod[t] ≈ f(t+1)/f(0)
    s = 0.008
    f = lambda u: math.cos((u + s) / (1 + s) * math.pi / 2) ** 2
    t = 499
    expected = f((t + 1) / 1000) / f(0)
    assert math.isclose(acp[t], expected, rel_tol=1e-6)


def test_zero_terminal_snr():
    betas = beta_schedule(
        "cosine", num_timesteps=1000, cosine_s=0.008, zero_terminal_snr=True
    )
    acp = np.cumprod(1 - betas)
    # terminal SNR is exactly zero: alphas_cumprod[-1] == 0
    assert abs(acp[-1]) < 1e-12
    # first-step value preserved
    raw = cosine_schedule(1000)
    assert math.isclose(acp[0], (1 - raw[0]), rel_tol=1e-9)


def test_zero_terminal_snr_ddim_includes_t_max():
    """DDIM step sequences that include t = T-1 (any ddim_timesteps that
    doesn't divide T, e.g. 3 of 1000 → [999, 667, 334, 1]) must stay finite
    under zero-terminal-SNR: alphas_cumprod[T-1] == 0 makes the raw
    reciprocal tables inf and x0_to_eps NaN (a latent reference bug — its
    shipped 50-step configs never sample t=999). The clamped reciprocals
    recover the exact limit eps -> xt instead."""
    import jax
    import jax.numpy as jnp

    from videomv_tpu.diffusion import GaussianDiffusion
    from videomv_tpu.diffusion.samplers import ddim_sample_loop, ddim_timestep_seq

    d = GaussianDiffusion(
        schedule="cosine",
        schedule_param=dict(num_timesteps=1000, cosine_s=0.008,
                            zero_terminal_snr=True),
        mean_type="v", var_type="fixed_small",
    )
    p = d.params
    assert np.isfinite(np.asarray(p.sqrt_recip_alphas_cumprod)).all()
    assert np.isfinite(np.asarray(p.sqrt_recipm1_alphas_cumprod)).all()
    # non-terminal entries match the unclamped math (clamp at 1e-12 is a
    # no-op for every acp >= 1e-12; tolerance only covers re-deriving acp
    # from the f32-stored betas here)
    acp = np.cumprod(1 - np.asarray(p.betas, dtype=np.float64))
    np.testing.assert_allclose(
        np.asarray(p.sqrt_recip_alphas_cumprod)[:-1],
        np.sqrt(1.0 / acp[:-1]),
        rtol=1e-6,
    )
    # the terminal-limit algebra: x0_to_eps -> xt as acp -> 0
    xt = jnp.ones((1, 2, 2))
    t = jnp.full((1,), 999, jnp.int32)
    eps = d.x0_to_eps(jnp.zeros_like(xt), xt, t)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(xt), rtol=1e-5)

    assert 999 in ddim_timestep_seq(1000, 3)
    out = ddim_sample_loop(
        d, lambda x, tt: (jnp.zeros_like(x), jnp.zeros_like(x)),
        jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 4, 4)),
        ddim_timesteps=3, guide_scale=6.0, rng=jax.random.PRNGKey(1),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_rescale_noop_shapes():
    betas = linear_sd_schedule(100, 0.001, 0.02)
    out = rescale_zero_terminal_snr(betas)
    assert out.shape == betas.shape
    assert np.all(out > 0) and np.all(out <= 1)


def test_logsnr_cosine_interp_is_sigmas():
    sig = logsnr_cosine_interp_schedule(100)
    assert np.all(sig > 0) and np.all(sig < 1)
    assert np.all(np.diff(sig) > 0)  # sigma increases with t


def test_karras_sigmas_monotone():
    sig = karras_sigmas(50)
    assert np.all(np.diff(sig) > 0)
    assert sig.shape == (50,)


def test_beta_schedule_dispatch():
    for name in ["linear", "linear_sd", "quadratic"]:
        betas = beta_schedule(name, num_timesteps=10, init_beta=1e-4, last_beta=0.02)
        assert betas.shape == (10,)
    with pytest.raises(KeyError):
        beta_schedule("nope", num_timesteps=10)
