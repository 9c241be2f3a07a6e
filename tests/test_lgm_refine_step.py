"""LGM-refine training step at tiny scale: loss finite, only LGM params move."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from videomv_tpu.data.cameras import GSCameraSettings, orbit_c2w_opengl, prepare_gs_training
from videomv_tpu.diffusion import GaussianDiffusion
from videomv_tpu.models import UNetSD_T2VBase
from videomv_tpu.models.lgm import LGM, LGMOptions
from videomv_tpu.parallel import make_mesh, make_t2v_apply, replicate, shard_batch
from videomv_tpu.training.lgm_refine import LGMTrainState, build_lgm_refine_step

TINY_LGM = LGMOptions(
    input_size=16, down_channels=(32, 64), down_attention=(False, True),
    mid_attention=True, up_channels=(64, 32), up_attention=(True, False),
    splat_size=16, output_size=16, num_input_views=2,
)


@pytest.mark.slow
def test_lgm_refine_training_step():
    mesh = make_mesh(8)
    f, hw, S = 4, 16, 16  # 4 views, 16x16 latents

    unet = UNetSD_T2VBase(
        in_dim=4, dim=32, y_dim=16, context_dim=16, out_dim=4, dim_mult=(1,),
        num_heads=1, head_dim=32, num_res_blocks=1, attn_scales=(1.0,),
        dropout=0.0, use_camera_condition=False, temporal_attention=False,
    )
    # small VAE stand-in: real module, tiny channels
    from videomv_tpu.models.autoencoder import AutoencoderKL

    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    lgm = LGM(opt=TINY_LGM)
    diffusion = GaussianDiffusion(
        schedule="linear_sd",
        schedule_param=dict(num_timesteps=100, init_beta=0.00085, last_beta=0.0120),
        mean_type="eps", var_type="fixed_small",
    )

    b = 8
    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (b, 4, f, hw, hw)) * 0.2
    y = jax.random.normal(jax.random.fold_in(rng, 1), (b, 3, 16))
    unet_params = jax.jit(unet.init)(
        jax.random.fold_in(rng, 2), latents, jnp.zeros((b,), jnp.int32), y=y
    )
    # tiny vae latent is hw for a 4x-downsampling (ch_mult len 2): input 64
    img_size = hw * 2  # one downsample in tiny vae
    vae_params = jax.jit(vae.init)(
        jax.random.fold_in(rng, 3), jnp.zeros((1, 3, img_size, img_size))
    )
    lgm_in = jnp.zeros((1, 2, 9, TINY_LGM.input_size, TINY_LGM.input_size))
    lgm_params = jax.jit(lgm.init)(jax.random.fold_in(rng, 4), lgm_in)

    st = GSCameraSettings(input_size=TINY_LGM.input_size, output_size=TINY_LGM.output_size)
    cams = prepare_gs_training(orbit_c2w_opengl(f, 0, 2.0), st, ray_size=TINY_LGM.input_size)

    R = TINY_LGM.output_size
    batch = {
        "latents": latents,
        "y_words": y,
        "gs_rays": jnp.broadcast_to(jnp.asarray(cams["input_rays"]), (b, f, 6, S, S)),
        "cam_view": jnp.broadcast_to(jnp.asarray(cams["cam_view"]), (b, f, 4, 4)),
        "cam_view_proj": jnp.broadcast_to(jnp.asarray(cams["cam_view_proj"]), (b, f, 4, 4)),
        "images_gt": jnp.full((b, f, 3, R, R), 0.5),
        "masks_gt": jnp.ones((b, f, 1, R, R)) * 0.5,
    }

    opt = optax.adam(1e-4)
    state = LGMTrainState(
        step=jnp.zeros((), jnp.int32),
        lgm_params=replicate(mesh, lgm_params),
        opt_state=replicate(mesh, jax.jit(opt.init)(lgm_params)),
    )
    step_fn = build_lgm_refine_step(
        make_t2v_apply(unet), vae, lgm, diffusion, opt, mesh,
        n_input_views=2, n_supervise_extra=1,
        render_size=R, splat_backend="dense",
    )
    frozen = (replicate(mesh, unet_params), replicate(mesh, vae_params))
    # step_fn donates its state; keep an undonated copy for the LPIPS run
    lgm_params_copy = jax.tree_util.tree_map(lambda x: x + 0.0, lgm_params)
    before = jax.device_get(
        jax.tree_util.tree_leaves(state.lgm_params)[0]
    ).copy()
    state, loss, aux = step_fn(state, frozen, shard_batch(mesh, batch), rng)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert np.isfinite(float(aux["psnr"]))
    assert float(aux["loss_lpips"]) == 0.0  # no lpips module given
    after = jax.device_get(jax.tree_util.tree_leaves(state.lgm_params)[0])
    assert np.abs(after - before).max() > 0, "LGM params must update"

    # --- with LPIPS: loss must include a nonzero perceptual term and equal
    # the no-lpips loss plus lambda * lpips (reference core/models.py:167-184)
    from videomv_tpu.models.lpips import LPIPS

    lpips = LPIPS()
    probe = jnp.zeros((1, 3, R, R))
    lpips_params = jax.jit(lpips.init)(jax.random.fold_in(rng, 5), probe, probe)
    state2 = LGMTrainState(
        step=jnp.zeros((), jnp.int32),
        lgm_params=replicate(mesh, lgm_params_copy),
        opt_state=replicate(mesh, jax.jit(opt.init)(lgm_params_copy)),
    )
    step_lp = build_lgm_refine_step(
        make_t2v_apply(unet), vae, lgm, diffusion, opt, mesh,
        n_input_views=2, n_supervise_extra=1,
        render_size=R, splat_backend="dense", lpips=lpips, lambda_lpips=0.5,
    )
    frozen_lp = frozen + (replicate(mesh, lpips_params),)
    state2, loss_lp, aux_lp = step_lp(
        state2, frozen_lp, shard_batch(mesh, batch), rng
    )
    lp_term = float(aux_lp["loss_lpips"])
    assert np.isfinite(float(loss_lp))
    assert lp_term != 0.0, "LPIPS term must contribute"
    # fresh state above reproduces the same MSE part (same rng at step 0)
    np.testing.assert_allclose(
        float(loss_lp), float(loss) + 0.5 * lp_term, rtol=1e-5
    )


@pytest.mark.slow
def test_lgm_refine_view_chunked_matches_unchunked():
    """view_chunk + per-block LGM remat (the 512²-fit memory levers,
    PERF.md round 4) are numerically exact: same loss/aux and same updated
    params as the plain all-views step."""
    from videomv_tpu.models.lpips import LPIPS

    mesh = make_mesh(8)
    f, hw, S = 4, 16, 16

    unet = UNetSD_T2VBase(
        in_dim=4, dim=32, y_dim=16, context_dim=16, out_dim=4, dim_mult=(1,),
        num_heads=1, head_dim=32, num_res_blocks=1, attn_scales=(1.0,),
        dropout=0.0, use_camera_condition=False, temporal_attention=False,
    )
    from videomv_tpu.models.autoencoder import AutoencoderKL

    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    diffusion = GaussianDiffusion(
        schedule="linear_sd",
        schedule_param=dict(num_timesteps=100, init_beta=0.00085, last_beta=0.0120),
        mean_type="eps", var_type="fixed_small",
    )

    b = 8
    rng = jax.random.PRNGKey(10)
    latents = jax.random.normal(rng, (b, 4, f, hw, hw)) * 0.2
    y = jax.random.normal(jax.random.fold_in(rng, 1), (b, 3, 16))
    unet_params = jax.jit(unet.init)(
        jax.random.fold_in(rng, 2), latents, jnp.zeros((b,), jnp.int32), y=y
    )
    img_size = hw * 2
    vae_params = jax.jit(vae.init)(
        jax.random.fold_in(rng, 3), jnp.zeros((1, 3, img_size, img_size))
    )
    lgm_plain = LGM(opt=TINY_LGM)
    lgm_remat = LGM(opt=TINY_LGM, use_checkpoint=True)
    lgm_in = jnp.zeros((1, 2, 9, TINY_LGM.input_size, TINY_LGM.input_size))
    lgm_params = jax.jit(lgm_plain.init)(jax.random.fold_in(rng, 4), lgm_in)
    # remat is a lifted transform: the param tree is unchanged
    chex_tree = jax.eval_shape(lgm_remat.init, jax.random.PRNGKey(0), lgm_in)
    assert jax.tree_util.tree_structure(chex_tree) == \
        jax.tree_util.tree_structure(lgm_params)

    st = GSCameraSettings(input_size=TINY_LGM.input_size, output_size=TINY_LGM.output_size)
    cams = prepare_gs_training(orbit_c2w_opengl(f, 0, 2.0), st, ray_size=TINY_LGM.input_size)
    R = TINY_LGM.output_size
    batch = {
        "latents": latents,
        "y_words": y,
        "gs_rays": jnp.broadcast_to(jnp.asarray(cams["input_rays"]), (b, f, 6, S, S)),
        "cam_view": jnp.broadcast_to(jnp.asarray(cams["cam_view"]), (b, f, 4, 4)),
        "cam_view_proj": jnp.broadcast_to(jnp.asarray(cams["cam_view_proj"]), (b, f, 4, 4)),
        "images_gt": jnp.full((b, f, 3, R, R), 0.4),
        "masks_gt": jnp.ones((b, f, 1, R, R)) * 0.5,
    }
    lpips = LPIPS()
    probe = jnp.zeros((1, 3, R, R))
    lpips_params = jax.jit(lpips.init)(jax.random.fold_in(rng, 5), probe, probe)
    frozen = (
        replicate(mesh, unet_params),
        replicate(mesh, vae_params),
        replicate(mesh, lpips_params),
    )
    # SGD: param diff is lr·(grad diff), directly proportional — adam's
    # g/(√v+ε) amplifies float-reassociation noise in near-zero grads
    # into O(lr) update flips, which is optimizer sensitivity, not a
    # chunking error (loss/aux equality below pins the math itself)
    opt = optax.sgd(1e-2)

    def run(lgm_mod, view_chunk):
        state = LGMTrainState(
            step=jnp.zeros((), jnp.int32),
            lgm_params=replicate(
                mesh, jax.tree_util.tree_map(lambda x: x + 0.0, lgm_params)
            ),
            opt_state=replicate(mesh, jax.jit(opt.init)(lgm_params)),
        )
        step = build_lgm_refine_step(
            make_t2v_apply(unet), vae, lgm_mod, diffusion, opt, mesh,
            n_input_views=2, n_supervise_extra=1,  # nv = 3 supervision views
            render_size=R, splat_backend="dense", lpips=lpips,
            lambda_lpips=0.5, view_chunk=view_chunk,
        )
        state, loss, aux = step(state, frozen, shard_batch(mesh, batch), rng)
        return state, float(loss), aux

    s0, loss0, aux0 = run(lgm_plain, view_chunk=0)
    s1, loss1, aux1 = run(lgm_remat, view_chunk=1)

    np.testing.assert_allclose(loss1, loss0, rtol=1e-6)
    np.testing.assert_allclose(
        float(aux1["loss_lpips"]), float(aux0["loss_lpips"]), rtol=1e-6)
    np.testing.assert_allclose(float(aux1["psnr"]), float(aux0["psnr"]), rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s1.lgm_params),
                     jax.tree_util.tree_leaves(s0.lgm_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)
