"""Inference-time GS-refine branch (make_refine_fn): cond/uncond semantics.

The reference runs the refine for BOTH CFG rows (diffusion_ddim.py:148-155
passes ``autoencoder`` to both model calls) — ``uncond_mode='full'``
reproduces that.  ``'shared'`` is the opt-in fast serving mode: only the
cond row refines and the uncond row aliases it, which must (a) return an
identical pair and (b) leave the cond row's latents unchanged vs 'full'.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomv_tpu.data.cameras import GSCameraSettings, orbit_c2w_opengl, prepare_gs_training
from videomv_tpu.diffusion import GaussianDiffusion
from videomv_tpu.inference.refine import make_refine_fn
from videomv_tpu.models import UNetSD_T2VBase
from videomv_tpu.models.autoencoder import AutoencoderKL
from videomv_tpu.models.lgm import LGM, LGMOptions


@pytest.fixture(scope="module")
def tiny_stack():
    f, hw = 6, 4  # latent 4x4 -> image 32x32
    size = hw * 8
    unet = UNetSD_T2VBase(
        dim=64, y_dim=16, context_dim=16, dim_mult=(1, 2), num_heads=2,
        head_dim=16, num_res_blocks=1, attn_scales=(1.0,), dropout=0.0,
        use_camera_condition=True,
    )
    vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 1, 2), num_res_blocks=1)
    lgm_opt = LGMOptions(
        input_size=size, down_channels=(32, 64), down_attention=(False, True),
        mid_attention=True, up_channels=(64, 32), up_attention=(True, False),
        splat_size=size, output_size=size, num_views=f, num_input_views=4,
    )
    lgm = LGM(opt=lgm_opt)
    diffusion = GaussianDiffusion(
        schedule="linear_sd",
        schedule_param=dict(num_timesteps=100, init_beta=0.00085, last_beta=0.012),
        mean_type="eps", var_type="fixed_small",
    )

    from videomv_tpu.data.cameras import orbit_camera_for_t2v
    cam = jnp.asarray(orbit_camera_for_t2v(num_frames=f))
    gs_settings = GSCameraSettings(input_size=size, output_size=size)
    gs = prepare_gs_training(orbit_c2w_opengl(f, 15.0, 2.0), gs_settings, ray_size=size)

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    x = jnp.zeros((1, 4, f, hw, hw))
    y = jax.random.normal(ks[3], (1, 5, 16))
    params = {
        "unet": jax.jit(unet.init)(ks[0], x, jnp.zeros((1,), jnp.int32), y=y,
                                   camera_data=cam),
        "vae": jax.jit(vae.init)(ks[1], jnp.zeros((1, 3, size, size))),
        "lgm": jax.jit(lgm.init)(ks[2], jnp.zeros((1, 4, 9, size, size))),
    }
    common = dict(
        unet=unet, vae=vae, lgm=lgm, params=params, diffusion=diffusion,
        scale_factor=0.18215, batch=1, gs_settings=gs_settings,
        y=y, zero_y=jnp.zeros_like(y), cam=cam,
        gs_rays=jnp.asarray(gs["input_rays"]),
        cam_view=jnp.asarray(gs["cam_view"]),
        cam_view_proj=jnp.asarray(gs["cam_view_proj"]),
        splat_backend="dense",
        view_idxs=(0, 1, 2, 3),  # f=6 here; the reference 24-frame default
                                 # (0, 6, 12, 18) is out of range
    )
    xt = jax.random.normal(jax.random.PRNGKey(7), (1, 4, f, hw, hw))
    t = jnp.full((1,), 40, jnp.int32)
    return common, xt, t


def test_full_mode_shapes_and_finite(tiny_stack):
    common, xt, t = tiny_stack
    rfn = jax.jit(make_refine_fn(**common, uncond_mode="full"))
    c, u = rfn(xt, t)
    assert c.shape == u.shape == xt.shape
    assert np.isfinite(np.asarray(c)).all() and np.isfinite(np.asarray(u)).all()
    # NOTE: at random init the UNet's zero-init head gives eps=0 for both
    # rows, so cond == uncond here; with trained weights they differ. The
    # structural cond/uncond distinction is covered by the mode test below.


@pytest.mark.slow
def test_shared_mode_aliases_cond(tiny_stack):
    common, xt, t = tiny_stack
    full = jax.jit(make_refine_fn(**common, uncond_mode="full"))
    shared = jax.jit(make_refine_fn(**common, uncond_mode="shared"))
    c_full, _ = full(xt, t)
    c_sh, u_sh = shared(xt, t)
    np.testing.assert_array_equal(np.asarray(c_sh), np.asarray(u_sh))
    np.testing.assert_allclose(
        np.asarray(c_sh), np.asarray(c_full), rtol=2e-4, atol=2e-5,
    )


def test_bad_mode_raises(tiny_stack):
    common, _, _ = tiny_stack
    with pytest.raises(ValueError, match="uncond_mode"):
        make_refine_fn(**common, uncond_mode="typo")
