"""GSPMD mesh sharding + training step on the 8-device CPU mesh, and the
driver contract (__graft_entry__.dryrun_multichip)."""

import sys

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


def test_mesh_and_batch_sharding():
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(8)
    batch = {"x": jnp.zeros((8, 4))}
    sharded = shard_batch(mesh, batch)
    # each device holds one row
    shards = sharded["x"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 4)


@pytest.mark.slow
def test_dp_train_step_loss_matches_single_device():
    """The 8-way sharded step must produce the same loss as an equivalent
    single-device computation (GSPMD psum correctness)."""
    mesh = make_mesh(8)
    model = UNetSD_T2VBase(
        in_dim=4, dim=32, y_dim=16, context_dim=16, out_dim=4, dim_mult=(1,),
        num_heads=1, head_dim=32, num_res_blocks=1, attn_scales=(1.0,),
        dropout=0.0, use_camera_condition=False, temporal_attention=False,
    )
    diffusion = GaussianDiffusion(
        schedule="linear_sd",
        schedule_param=dict(num_timesteps=100, init_beta=0.00085, last_beta=0.0120),
        mean_type="eps", var_type="fixed_small",
    )
    b, f, hw = 8, 2, 8
    latents = jax.random.normal(jax.random.PRNGKey(0), (b, 4, f, hw, hw))
    y = jax.random.normal(jax.random.PRNGKey(1), (b, 3, 16))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(2), latents, jnp.zeros((b,), jnp.int32), y=y
    )
    opt = optax.sgd(0.0)  # no-op update: isolates the loss computation
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=replicate(mesh, params),
        opt_state=replicate(mesh, jax.jit(opt.init)(params)),
        ema_params=None,
    )
    step_fn = build_train_step(model, diffusion, opt, mesh, use_ema=False, p_zero=0.0)
    batch = shard_batch(mesh, {"latents": latents, "y_words": y})
    rng = jax.random.PRNGKey(3)

    # compute the expected loss FIRST — step_fn donates (and thus deletes)
    # the state buffers, which alias `params`
    rng_used = jax.random.fold_in(rng, 0)
    t_rng, n_rng, z_rng, d_rng = jax.random.split(rng_used, 4)
    t = jax.random.randint(t_rng, (b,), 0, diffusion.num_timesteps)

    def model_fn(xt, ts):
        return model.apply(params, xt, ts, y=y)

    loss_vec, _ = diffusion.loss(n_rng, model_fn, latents, t)
    expected = float(loss_vec.mean())

    new_state, loss = step_fn(state, batch, rng)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), expected, rtol=2e-4)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_i2v_train_step():
    """The generalized train step must thread I2V conditioning
    (local_image + image_embed) through the sharded program."""
    from videomv_tpu.models import UNetSD_I2VGen
    from videomv_tpu.parallel import make_i2v_apply

    mesh = make_mesh(8)
    model = UNetSD_I2VGen(
        in_dim=4, dim=64, y_dim=48, context_dim=32, out_dim=4, dim_mult=(1, 2),
        num_heads=2, head_dim=16, num_res_blocks=1, attn_scales=(1.0,),
        dropout=0.0, use_camera_condition=True,
    )
    diffusion = GaussianDiffusion(
        schedule="cosine",
        schedule_param=dict(num_timesteps=100, cosine_s=0.008, zero_terminal_snr=True),
        mean_type="v", var_type="fixed_small", noise_strength=0.1,
    )
    b, f, hw = 8, 2, 32
    latents = jax.random.normal(jax.random.PRNGKey(0), (b, 4, f, hw, hw))
    y = jax.random.normal(jax.random.PRNGKey(1), (b, 3, 32))
    cam = jnp.zeros((b, f, 16))
    local = jax.random.normal(jax.random.PRNGKey(2), (b, 4, 1, hw, hw))
    img_emb = jax.random.normal(jax.random.PRNGKey(3), (b, 48))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(4), latents, jnp.zeros((b,), jnp.int32), y=y,
        camera_data=cam, local_image=local, image=img_emb,
    )
    opt = optax.adamw(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=replicate(mesh, params),
        opt_state=replicate(mesh, jax.jit(opt.init)(params)),
        ema_params=None,
    )
    step_fn = build_train_step(
        make_i2v_apply(model), diffusion, opt, mesh, use_ema=False, p_zero=0.1
    )
    batch = shard_batch(mesh, {
        "latents": latents, "y_words": y, "camera_data": cam,
        "local_image": local, "image_embed": img_emb,
    })
    state, loss = step_fn(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
    # one more step exercises the donated-state path
    batch = shard_batch(mesh, {
        "latents": latents, "y_words": y, "camera_data": cam,
        "local_image": local, "image_embed": img_emb,
    })
    state, loss2 = step_fn(state, batch, jax.random.PRNGKey(6))
    assert np.isfinite(float(loss2))


def test_cfg_dropout_substitutes_negative_embedding():
    """Dropped text rows must become the provided negative-prompt embedding
    (reference zero_y_negative, train_t2v_enterance.py:173-175,274), not
    zeros. Proven end-to-end: a step with p_zero=1 and zero_y=Z must produce
    exactly the loss of a step with p_zero=0 whose batch y IS Z — and a
    different loss from the zeros fallback."""
    mesh = make_mesh(8)
    diffusion = GaussianDiffusion(
        schedule="linear_sd",
        schedule_param=dict(num_timesteps=100, init_beta=0.00085, last_beta=0.0120),
        mean_type="eps", var_type="fixed_small",
    )
    b, f, hw, L, C = 8, 2, 8, 3, 16
    latents = jax.random.normal(jax.random.PRNGKey(0), (b, 4, f, hw, hw))
    y = jax.random.normal(jax.random.PRNGKey(1), (b, L, C))
    zero_y = jax.random.normal(jax.random.PRNGKey(2), (1, L, C))

    def apply_fn(params, xt, t, yy, batch, rng):
        # output depends on the conditioning so the loss reveals which y
        # the model actually saw
        return xt + yy.mean(axis=(1, 2))[:, None, None, None, None]

    opt = optax.sgd(0.0)

    def run(p_zero, zy, y_batch):
        params = {"w": jnp.zeros(())}
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=replicate(mesh, params),
            opt_state=replicate(mesh, jax.jit(opt.init)(params)),
            ema_params=None,
        )
        fn = build_train_step(
            apply_fn, diffusion, opt, mesh, use_ema=False,
            p_zero=p_zero, zero_y=zy,
        )
        batch = shard_batch(mesh, {"latents": latents, "y_words": y_batch})
        _, loss = fn(state, batch, jax.random.PRNGKey(3))
        return float(loss)

    dropped = run(1.0, zero_y, y)                       # all rows dropped → Z
    explicit = run(0.0, zero_y, jnp.broadcast_to(zero_y, (b, L, C)))
    zeros_fallback = run(1.0, None, y)                  # legacy zeros path
    kept = run(0.0, zero_y, y)                          # nothing dropped
    np.testing.assert_allclose(dropped, explicit, rtol=1e-6)
    assert abs(dropped - zeros_fallback) > 1e-6
    assert abs(dropped - kept) > 1e-6


@pytest.mark.slow
def test_fsdp_sharded_train_step_matches_replicated():
    """ZeRO-style fully-sharded state (fsdp_shardings) must (a) actually
    shard the large param leaves over the dp axis, and (b) produce the
    same loss and updated params as the replicated step."""
    from videomv_tpu.parallel import fsdp_shardings

    mesh = make_mesh(8)
    model = UNetSD_T2VBase(
        in_dim=4, dim=32, y_dim=16, context_dim=16, out_dim=4, dim_mult=(1,),
        num_heads=1, head_dim=32, num_res_blocks=1, attn_scales=(1.0,),
        dropout=0.0, use_camera_condition=False, temporal_attention=False,
    )
    diffusion = GaussianDiffusion(
        schedule="linear_sd",
        schedule_param=dict(num_timesteps=100, init_beta=0.00085, last_beta=0.0120),
        mean_type="eps", var_type="fixed_small",
    )
    b, f, hw = 8, 2, 8
    latents = jax.random.normal(jax.random.PRNGKey(0), (b, 4, f, hw, hw))
    y = jax.random.normal(jax.random.PRNGKey(1), (b, 3, 16))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(2), latents, jnp.zeros((b,), jnp.int32), y=y
    )
    opt = optax.adamw(1e-3)
    opt_state = jax.jit(opt.init)(params)
    batch = {"latents": latents, "y_words": y}
    rng = jax.random.PRNGKey(3)

    def make_state(place):
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=place(params), opt_state=place(opt_state), ema_params=None,
        )

    # fsdp placement FIRST (the steps donate+delete their input buffers):
    # threshold low so even tiny test params get sharded
    p_sh = fsdp_shardings(params, mesh, min_size=1024)
    o_sh = fsdp_shardings(opt_state, mesh, min_size=1024)
    state_sh = TrainState(
        step=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        params=p_sh, opt_state=o_sh, ema_params=None,
    )
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    place_fsdp = lambda tree, sh: jax.tree_util.tree_map(jax.device_put, tree, sh)
    fsdp_state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=place_fsdp(copy(params), p_sh),
        opt_state=place_fsdp(copy(opt_state), o_sh),
        ema_params=None,
    )

    # replicated control
    step_repl = build_train_step(model, diffusion, opt, mesh,
                                 use_ema=False, p_zero=0.0)
    s1, loss1 = step_repl(make_state(lambda t: replicate(mesh, copy(t))),
                          shard_batch(mesh, batch), rng)
    # at least one leaf must actually be split over dp
    sharded_leaves = [
        s for s in jax.tree_util.tree_leaves(
            p_sh, is_leaf=lambda x: isinstance(x, jax.sharding.NamedSharding))
        if "dp" in str(s.spec)
    ]
    assert sharded_leaves, "no param leaf got sharded"

    step_fsdp = build_train_step(model, diffusion, opt, mesh, use_ema=False,
                                 p_zero=0.0, state_shardings=state_sh)
    s2, loss2 = step_fsdp(fsdp_state, shard_batch(mesh, batch), rng)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=2e-5)
    # updated params identical (up to fp assoc in the collectives)
    for a, bb in zip(jax.tree_util.tree_leaves(s1.params),
                     jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=5e-5, atol=5e-6)
    # and the new state keeps the sharded placement
    some = [x for x in jax.tree_util.tree_leaves(s2.params)
            if "dp" in str(x.sharding.spec)]
    assert some, "output params lost the fsdp sharding"
