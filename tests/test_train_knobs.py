"""Round-3 train-step knobs: remat_policy (checkpoint granularity) and
prng_impl (dropout bit generator).

remat_policy changes WHAT survives to the backward, never the math — grads
must match the default policy bit-for-bit (fp32 CPU). prng_impl re-seats
the dropout stream on a different generator — the step must run and the
loss stay finite/deterministic per seed, but values legitimately differ
from threefry."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from videomv_tpu.diffusion import GaussianDiffusion
from videomv_tpu.models import UNetSD_T2VBase
from videomv_tpu.parallel import (
    TrainState,
    build_train_step,
    make_mesh,
    replicate,
    shard_batch,
)


def _tiny(remat_policy="full"):
    return UNetSD_T2VBase(
        in_dim=4, dim=32, y_dim=16, context_dim=16, out_dim=4, dim_mult=(1,),
        num_heads=1, head_dim=32, num_res_blocks=1, attn_scales=(1.0,),
        dropout=0.1, use_camera_condition=False, use_checkpoint=True,
        remat_policy=remat_policy,
    )


def _diffusion():
    return GaussianDiffusion(
        schedule="linear_sd",
        schedule_param=dict(num_timesteps=100, init_beta=0.00085, last_beta=0.0120),
        mean_type="eps", var_type="fixed_small",
    )


@pytest.fixture(scope="module")
def scene():
    b, f, hw = 2, 2, 8
    latents = jax.random.normal(jax.random.PRNGKey(0), (b, 4, f, hw, hw))
    y = jax.random.normal(jax.random.PRNGKey(1), (b, 3, 16))
    params = jax.jit(_tiny().init)(
        jax.random.PRNGKey(2), latents, jnp.zeros((b,), jnp.int32), y=y
    )
    return latents, y, params


def _grads(model, scene, prng_impl=None):
    latents, y, params = scene
    diffusion = _diffusion()

    def loss_fn(p, rng):
        t_rng, n_rng, d_rng = jax.random.split(rng, 3)
        if prng_impl:
            kd = jax.random.bits(
                d_rng,
                jax.random.key_data(jax.random.key(0, impl=prng_impl)).shape,
                dtype=jnp.uint32,
            )
            d_rng = jax.random.wrap_key_data(kd, impl=prng_impl)
        t = jax.random.randint(t_rng, (latents.shape[0],), 0, diffusion.num_timesteps)

        def model_fn(xt, ts):
            return model.apply(
                p, xt, ts, y=y, deterministic=False, rngs={"dropout": d_rng}
            )

        loss_vec, _ = diffusion.loss(n_rng, model_fn, latents, t)
        return loss_vec.mean()

    return jax.jit(jax.value_and_grad(loss_fn))(params, jax.random.PRNGKey(5))


@pytest.mark.slow
def test_remat_policy_grads_match(scene):
    """'dots_no_batch' / 'dots' only change rematerialisation scheduling,
    never the math; loss and every gradient leaf must match the 'full'
    policy (tight fp32 tolerance — XLA may fuse/reassociate differently)."""
    base_loss, base_grads = _grads(_tiny("full"), scene)
    for policy in ("dots_no_batch", "dots"):
        loss, grads = _grads(_tiny(policy), scene)
        np.testing.assert_allclose(float(loss), float(base_loss), rtol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(base_grads), jax.tree_util.tree_leaves(grads)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )


def test_remat_policy_unknown_raises(scene):
    latents, y, _ = scene
    with pytest.raises(ValueError, match="remat_policy"):
        jax.eval_shape(
            lambda: _tiny("bogus").init(
                jax.random.PRNGKey(0), latents, jnp.zeros((2,), jnp.int32), y=y
            )
        )


def test_rbg_dropout_step_runs_and_is_deterministic(scene):
    """prng_impl='rbg' through the full build_train_step path: finite loss,
    params move, and the same seed gives the same loss twice."""
    latents, y, params = scene
    mesh = make_mesh(1)
    opt = optax.sgd(1e-3)
    model = _tiny("full")

    def fresh_state():
        # deep-copy before placing: the donating step DELETES its input
        # buffers, and replicate() on an already-placed array is an alias,
        # so donating the fixture's params directly would kill them for
        # every later test (CLAUDE.md donation gotcha)
        copy = jax.tree_util.tree_map(lambda x: x + 0.0, params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=replicate(mesh, copy),
            opt_state=replicate(mesh, jax.jit(opt.init)(copy)),
            ema_params=None,
        )

    step_fn = build_train_step(
        model, _diffusion(), opt, mesh, use_ema=False, p_zero=0.0,
        prng_impl="rbg",
    )
    batch = shard_batch(mesh, {"latents": latents, "y_words": y})
    st1, loss1 = step_fn(fresh_state(), batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss1))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(st1.params)
        )
    )
    assert moved, "sgd step with nonzero lr must change params"
    _, loss2 = step_fn(fresh_state(), batch, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(loss1), np.asarray(loss2))
