"""Gaussian diffusion algebra: identities and round-trips vs closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomv_tpu.diffusion import GaussianDiffusion
from videomv_tpu.diffusion.samplers import (
    ddim_sample_loop,
    ddim_timestep_seq,
    ddpm_sample_loop,
    plms_sample_loop,
)

T2V_SCHEDULE = dict(
    schedule="linear_sd",
    schedule_param=dict(num_timesteps=1000, init_beta=0.00085, last_beta=0.0120),
)


@pytest.fixture(scope="module")
def diff_eps():
    return GaussianDiffusion(**T2V_SCHEDULE, mean_type="eps", var_type="fixed_small")


@pytest.fixture(scope="module")
def diff_v():
    return GaussianDiffusion(
        schedule="cosine",
        schedule_param=dict(num_timesteps=1000, cosine_s=0.008, zero_terminal_snr=True),
        mean_type="v",
        var_type="fixed_small",
        noise_strength=0.1,
    )


def test_params_identities(diff_eps):
    p = diff_eps.params
    np.testing.assert_allclose(
        np.asarray(p.sqrt_alphas_cumprod) ** 2 + np.asarray(p.sqrt_one_minus_alphas_cumprod) ** 2,
        1.0,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(p.sqrt_recip_alphas_cumprod),
        1.0 / np.asarray(p.sqrt_alphas_cumprod),
        rtol=1e-5,
    )


def test_q_sample_statistics(diff_eps):
    rng = jax.random.PRNGKey(0)
    x0 = jnp.ones((4, 2, 3, 8, 8))
    t = jnp.full((4,), 500, dtype=jnp.int32)
    noise = jax.random.normal(rng, x0.shape)
    xt = diff_eps.q_sample(x0, t, noise)
    p = diff_eps.params
    a = float(p.sqrt_alphas_cumprod[500])
    s = float(p.sqrt_one_minus_alphas_cumprod[500])
    np.testing.assert_allclose(np.asarray(xt), a * np.asarray(x0) + s * np.asarray(noise), rtol=1e-5)


def test_eps_x0_roundtrip(diff_eps):
    """x0 -> (q_sample w/ eps) -> pred_to_x0(eps) must recover x0."""
    rng = jax.random.PRNGKey(1)
    x0 = jax.random.normal(rng, (2, 4, 3, 4, 4))
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = jnp.array([100, 900], dtype=jnp.int32)
    xt = diff_eps.q_sample(x0, t, noise)
    x0_rec = diff_eps.pred_to_x0(noise, xt, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=2e-3)
    # and eps recovery from x0
    eps_rec = diff_eps.x0_to_eps(x0, xt, t)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=2e-2)


def test_v_parameterization_roundtrip(diff_v):
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.normal(rng, (2, 4, 3, 4, 4))
    noise = jax.random.normal(jax.random.fold_in(rng, 3), x0.shape)
    t = jnp.array([10, 500], dtype=jnp.int32)
    xt = diff_v.q_sample(x0, t, noise)
    v = diff_v.target(x0, xt, t, noise)
    x0_rec = diff_v.pred_to_x0(v, xt, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_posterior_matches_closed_form(diff_eps):
    p = diff_eps.params
    t_i = 123
    betas = np.asarray(p.betas)
    acp = np.asarray(p.alphas_cumprod)
    acp_prev = np.asarray(p.alphas_cumprod_prev)
    expected_var = betas[t_i] * (1 - acp_prev[t_i]) / (1 - acp[t_i])
    assert np.isclose(float(p.posterior_variance[t_i]), expected_var, rtol=1e-6)


def test_offset_noise_shape(diff_v):
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 4, 6, 8, 8))
    noise = diff_v.sample_noise(rng, x0)
    assert noise.shape == x0.shape
    # offset noise adds per-(b,c,f) correlated component: mean over (h,w)
    # should have higher variance than iid gaussian would.
    strong = GaussianDiffusion(
        schedule="linear_sd",
        schedule_param=dict(num_timesteps=10, init_beta=0.00085, last_beta=0.0120),
        noise_strength=1.0,
    )
    noise2 = strong.sample_noise(rng, jnp.zeros((8, 4, 6, 8, 8)))
    m = np.asarray(noise2).mean(axis=(3, 4))
    # per-(b,c,f) mean std ≈ sqrt(1/64 + 1) ≈ 1.01 vs 0.125 without offset
    assert m.std() > 0.5


def test_ddim_timestep_seq():
    seq = ddim_timestep_seq(1000, 50)
    assert seq.shape == (50,)
    assert seq[0] == 981 and seq[-1] == 1
    assert np.all(np.diff(seq) == -20)


def _perfect_eps_model(diff, x0):
    """Model that returns the exact eps implied by xt and the true x0."""

    def fn(xt, t):
        return diff.x0_to_eps(x0, xt, jnp.asarray(t, dtype=jnp.int32))

    return fn


def test_ddim_loop_recovers_x0(diff_eps):
    """With a perfect eps oracle, 50-step DDIM from pure noise lands on x0."""
    rng = jax.random.PRNGKey(7)
    x0 = jax.random.normal(rng, (1, 4, 2, 8, 8)) * 0.5
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    model = _perfect_eps_model(diff_eps, x0)
    out = ddim_sample_loop(diff_eps, model, noise, ddim_timesteps=50, eta=0.0)
    # linear_sd keeps nonzero terminal SNR so recovery is near-exact
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.15)


def test_ddim_guided_pair(diff_eps):
    """guide_scale=1 must equal the cond-only prediction path."""
    rng = jax.random.PRNGKey(8)
    x0 = jax.random.normal(rng, (1, 4, 2, 8, 8)) * 0.5
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    cond = _perfect_eps_model(diff_eps, x0)

    def pair(xt, t):
        c = cond(xt, t)
        return c, jnp.zeros_like(c)

    guided = ddim_sample_loop(
        diff_eps, pair, noise, ddim_timesteps=10, eta=0.0, guide_scale=1.0
    )
    plain = ddim_sample_loop(diff_eps, cond, noise, ddim_timesteps=10, eta=0.0)
    np.testing.assert_allclose(np.asarray(guided), np.asarray(plain), atol=1e-5)


def test_ddim_refine_branch_runs(diff_eps):
    """refine_fn returning true x0 directly must also converge."""
    rng = jax.random.PRNGKey(9)
    x0 = jax.random.normal(rng, (1, 4, 2, 8, 8)) * 0.5
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    model = _perfect_eps_model(diff_eps, x0)

    def refine(xt, t):
        return jnp.broadcast_to(x0, xt.shape)

    out = ddim_sample_loop(
        diff_eps,
        model,
        noise,
        ddim_timesteps=50,
        eta=0.0,
        refine_fn=refine,
        refine_steps=(20, 30, 40),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.15)


def test_loss_eps_is_mse(diff_eps):
    rng = jax.random.PRNGKey(3)
    x0 = jax.random.normal(rng, (2, 4, 2, 4, 4))
    t = jnp.array([100, 200], dtype=jnp.int32)

    def zero_model(xt, ts):
        return jnp.zeros_like(xt)

    loss, aux = diff_eps.loss(rng, zero_model, x0, t)
    # loss for zero-prediction = mean(noise^2) per-sample
    expected = np.asarray(aux["noise"] ** 2).reshape(2, -1).mean(axis=1)
    np.testing.assert_allclose(np.asarray(loss), expected, rtol=1e-5)


def test_vlb_finite(diff_eps):
    rng = jax.random.PRNGKey(4)
    x0 = jax.random.normal(rng, (2, 4, 1, 4, 4)) * 0.1
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = jnp.array([0, 100], dtype=jnp.int32)
    xt = diff_eps.q_sample(x0, t, noise)

    def model(xt_, t_):
        return jnp.zeros_like(xt_)

    vlb, _ = diff_eps.variational_lower_bound(x0, xt, t, model)
    assert np.all(np.isfinite(np.asarray(vlb)))


def test_ddpm_and_plms_run(diff_eps):
    rng = jax.random.PRNGKey(5)
    x0 = jax.random.normal(rng, (1, 4, 1, 4, 4)) * 0.5
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    model = _perfect_eps_model(diff_eps, x0)
    out = plms_sample_loop(diff_eps, model, noise, plms_timesteps=20)
    # terminal step lands at t=1, retaining ~sqrt(1-acp[0])*eps noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.2)
    # ddpm: small T version for speed
    small = GaussianDiffusion(
        schedule="linear_sd",
        schedule_param=dict(num_timesteps=50, init_beta=0.00085, last_beta=0.0120),
        mean_type="eps",
        var_type="fixed_small",
    )
    model_small = _perfect_eps_model(small, x0)
    out2 = ddpm_sample_loop(small, model_small, noise, rng=rng)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_refine_loop_segments_match_plain(diff_eps):
    """The segmented refine loop must equal the plain scan when refine_fn
    merely converts the model's eps pair to x0 (the DDIM update is affine
    in eps, so combine-then-convert == convert-then-combine).  Exercises
    the static scan-segment split + inline refine steps + rng threading."""
    rng = jax.random.PRNGKey(3)
    x0 = jax.random.normal(rng, (1, 4, 2, 4, 4)) * 0.3
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)

    def model(xt, t):
        eps = diff_eps.x0_to_eps(x0, xt, jnp.asarray(t, jnp.int32))
        return eps + 0.05 * xt, eps - 0.05 * xt  # distinct cond/uncond

    def refine(xt, t):
        t32 = jnp.asarray(t, jnp.int32)
        c, u = model(xt, t)
        return diff_eps.pred_to_x0(c, xt, t32), diff_eps.pred_to_x0(u, xt, t32)

    key = jax.random.PRNGKey(11)
    plain = ddim_sample_loop(
        diff_eps, model, noise, ddim_timesteps=10, guide_scale=4.0, rng=key)
    refined = ddim_sample_loop(
        diff_eps, model, noise, ddim_timesteps=10, guide_scale=4.0,
        refine_fn=refine, refine_steps=(2, 5, 8), rng=key)
    np.testing.assert_allclose(
        np.asarray(refined), np.asarray(plain), rtol=2e-5, atol=2e-5)

    # and a refine_fn that actually CHANGES x0 must change the output
    def refine_const(xt, t):
        return jnp.ones_like(xt) * 0.1, jnp.ones_like(xt) * 0.1

    diverged = ddim_sample_loop(
        diff_eps, model, noise, ddim_timesteps=10, guide_scale=4.0,
        refine_fn=refine_const, refine_steps=(2, 5, 8), rng=key)
    assert float(jnp.abs(diverged - plain).max()) > 1e-3
