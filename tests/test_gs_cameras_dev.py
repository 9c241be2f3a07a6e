"""Device-side splat-camera derivation (ops/gs_cameras.py) vs the host
numpy chain (data/cameras.py::prepare_gs_training) — and the refine step's
camera-wire / uint8-GT-wire equivalences.

The host chain is itself parity-tested against the reference
(tools/datasets/video_dataset.py:103-144) in tests/test_cameras.py, so
matching it transitively proves the in-program derivation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from videomv_tpu.data.cameras import (
    GSCameraSettings, orbit_c2w_opengl, prepare_gs_training,
)
from videomv_tpu.ops.gs_cameras import (
    canonical_gs_poses, colmap_from_poses, plucker_rays_dev, proj_matrix,
)


@pytest.mark.parametrize("elev,dist", [(15.0, 2.0), (-30.0, 1.4)])
def test_dev_camera_prep_matches_host(elev, dist):
    V, S = 6, 32
    st = GSCameraSettings(input_size=S, output_size=S)
    cams = orbit_c2w_opengl(V, elev, dist)  # [V, 4, 4]
    # generic perturbation: jitter translations so the parity is not an
    # artifact of the exact orbit structure
    rng = np.random.RandomState(0)
    cams[:, :3, 3] += rng.uniform(-0.05, 0.05, size=(V, 3)).astype(np.float32)
    host = prepare_gs_training(cams, st, ray_size=S)

    camera_data = jnp.asarray(cams.reshape(1, V, 16))
    # prepare_gs_training applies (negate row 1, swap rows 1/2) to its
    # input; canonical_gs_poses applies the same — feed the same tensor
    poses = canonical_gs_poses(camera_data)
    rays = plucker_rays_dev(poses, S, st.fovy)
    cv, cvp, cam_pos = colmap_from_poses(poses, proj_matrix(st.fovy, st.znear, st.zfar))

    np.testing.assert_allclose(
        np.asarray(rays), host["input_rays"], atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(cv), host["cam_view"], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(cvp), host["cam_view_proj"], atol=5e-5, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(cam_pos), host["cam_pos"], atol=2e-5, rtol=1e-4)


def test_dev_camera_prep_canonicalizes_per_sample():
    """Batched derivation must canonicalize each sample to ITS pose 0."""
    V, S = 4, 16
    a = orbit_c2w_opengl(V, 15.0, 2.0)
    b = orbit_c2w_opengl(V, -10.0, 1.5)
    batch = jnp.asarray(np.stack([a.reshape(V, 16), b.reshape(V, 16)]))
    poses = canonical_gs_poses(batch)
    st = GSCameraSettings(input_size=S, output_size=S)
    for i, c in enumerate([a, b]):
        host = prepare_gs_training(c, st, ray_size=S)
        rays_i = plucker_rays_dev(poses[i], S, st.fovy)
        np.testing.assert_allclose(
            np.asarray(rays_i), host["input_rays"][0], atol=2e-5, rtol=1e-4
        )


def _tiny_refine_setup():
    from videomv_tpu.models import UNetSD_T2VBase
    from videomv_tpu.models.autoencoder import AutoencoderKL
    from videomv_tpu.models.lgm import LGM, LGMOptions
    from videomv_tpu.diffusion import GaussianDiffusion
    from videomv_tpu.parallel import make_mesh, make_t2v_apply, replicate

    opts = LGMOptions(
        input_size=16, down_channels=(32, 64), down_attention=(False, True),
        mid_attention=True, up_channels=(64, 32), up_attention=(True, False),
        splat_size=16, output_size=16, num_input_views=2,
    )
    mesh = make_mesh(8)
    f, hw = 4, 16
    unet = UNetSD_T2VBase(
        in_dim=4, dim=32, y_dim=16, context_dim=16, out_dim=4, dim_mult=(1,),
        num_heads=1, head_dim=32, num_res_blocks=1, attn_scales=(1.0,),
        dropout=0.0, use_camera_condition=False, temporal_attention=False,
    )
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    lgm = LGM(opt=opts)
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
    img_size = hw * 2
    vae_params = jax.jit(vae.init)(
        jax.random.fold_in(rng, 3), jnp.zeros((1, 3, img_size, img_size))
    )
    lgm_in = jnp.zeros((1, 2, 9, opts.input_size, opts.input_size))
    lgm_params = jax.jit(lgm.init)(jax.random.fold_in(rng, 4), lgm_in)
    return (opts, mesh, unet, vae, lgm, diffusion, b, f,
            latents, y, unet_params, vae_params, lgm_params, rng,
            make_t2v_apply, replicate)


@pytest.mark.slow
def test_refine_step_device_cameras_match_host_wire():
    """The refine step with in-program camera derivation + uint8 GT wire
    reproduces the host-prepared-gs-block step bit-for-tolerance: same
    loss, same aux, same parameter update."""
    from videomv_tpu.parallel import shard_batch
    from videomv_tpu.training.lgm_refine import LGMTrainState, build_lgm_refine_step

    (opts, mesh, unet, vae, lgm, diffusion, b, f,
     latents, y, unet_params, vae_params, lgm_params, rng,
     make_t2v_apply, replicate) = _tiny_refine_setup()

    S = R = opts.input_size
    st = GSCameraSettings(input_size=S, output_size=R)
    cams_np = orbit_c2w_opengl(f, 15.0, 2.0)  # [f, 4, 4]
    host = prepare_gs_training(cams_np, st, ray_size=S)
    camera_data = np.broadcast_to(cams_np.reshape(1, f, 16), (b, f, 16)).copy()

    # GT frames quantized to 8-bit levels so both wires carry identical data
    gt_u8 = (np.arange(b * f * 3 * R * R).reshape(b, f, 3, R, R) % 256).astype(np.uint8)
    mask_u8 = np.full((b, f, 1, R, R), 255, np.uint8)

    common = {"latents": latents, "y_words": y,
              "camera_data": jnp.asarray(camera_data)}
    batch_host = dict(common)
    batch_host.update({
        "gs_rays": jnp.broadcast_to(jnp.asarray(host["input_rays"]), (b, f, 6, S, S)),
        "cam_view": jnp.broadcast_to(jnp.asarray(host["cam_view"]), (b, f, 4, 4)),
        "cam_view_proj": jnp.broadcast_to(jnp.asarray(host["cam_view_proj"]), (b, f, 4, 4)),
        "images_gt": jnp.asarray(gt_u8, jnp.float32) / 255.0,
        "masks_gt": jnp.asarray(mask_u8, jnp.float32) / 255.0,
    })
    batch_dev = dict(common)
    batch_dev.update({
        "images_gt": jnp.asarray(gt_u8),   # uint8 wire
        "masks_gt": jnp.asarray(mask_u8),
    })

    opt = optax.adam(1e-4)
    step_fn = build_lgm_refine_step(
        make_t2v_apply(unet), vae, lgm, diffusion, opt, mesh,
        n_input_views=2, n_supervise_extra=1,
        render_size=R, ray_size=S, fovy_deg=st.fovy,
        znear=st.znear, zfar=st.zfar, splat_backend="dense",
    )
    frozen = (replicate(mesh, unet_params), replicate(mesh, vae_params))

    results = []
    for batch in (batch_host, batch_dev):
        state = LGMTrainState(
            step=jnp.zeros((), jnp.int32),
            lgm_params=replicate(
                mesh, jax.tree_util.tree_map(lambda x: x + 0.0, lgm_params)
            ),
            opt_state=replicate(mesh, jax.jit(opt.init)(lgm_params)),
        )
        state, loss, aux = step_fn(state, frozen, shard_batch(mesh, batch), rng)
        results.append((float(loss), float(aux["psnr"]),
                        jax.device_get(jax.tree_util.tree_leaves(state.lgm_params)[0])))

    (l_h, p_h, w_h), (l_d, p_d, w_d) = results
    assert np.isfinite(l_h)
    np.testing.assert_allclose(l_d, l_h, rtol=2e-5)
    np.testing.assert_allclose(p_d, p_h, rtol=2e-4)
    np.testing.assert_allclose(w_d, w_h, atol=1e-7)


def test_engine_gs_features_wire_modes():
    """_gs_features honors gs_wire_cameras / wire_uint8: the default wire
    carries only uint8 GT frames; the legacy wire carries the full block."""
    from videomv_tpu.training.engine import T2VTrainer

    class _Stub(T2VTrainer):  # bypass heavy __init__
        def __init__(self, cfg, lgm_opts):
            self.cfg = cfg
            class _L: opt = lgm_opts
            self.lgm = _L()

    from videomv_tpu.models.lgm import LGMOptions

    opts = LGMOptions(input_size=16, splat_size=16, output_size=16,
                      num_input_views=2)
    f = 4
    cams = orbit_c2w_opengl(f, 15.0, 2.0).reshape(1, f, 16)
    gs = prepare_gs_training(cams, GSCameraSettings(input_size=16, output_size=16),
                             ray_size=16)
    host_batch = {
        "camera_data": cams.astype(np.float32),
        "gs_data": {
            "input": gs["input_rays"], "cam_view": gs["cam_view"],
            "cam_view_proj": gs["cam_view_proj"],
            "images_output": np.full((1, f, 3, 16, 16), 0.5, np.float32),
            "masks_output": np.ones((1, f, 1, 16, 16), np.float32),
        },
    }

    feats = _Stub({}, opts)._gs_features(host_batch)
    assert set(feats) == {"images_gt", "masks_gt"}
    assert feats["images_gt"].dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(feats["images_gt"][0, 0, 0, 0, 0]), 128)

    feats = _Stub({"gs_wire_cameras": False, "wire_uint8": False}, opts)._gs_features(host_batch)
    assert {"gs_rays", "cam_view", "cam_view_proj"} <= set(feats)
    assert feats["images_gt"].dtype == jnp.float32

    # camera-less gs_data (dataset prepare_gs_cameras=False) + legacy wire:
    # host cams must be re-derived from camera_data, not KeyError
    slim = dict(host_batch)
    slim["gs_data"] = {k: host_batch["gs_data"][k]
                       for k in ("images_output", "masks_output")}
    feats2 = _Stub({"gs_wire_cameras": False, "wire_uint8": False}, opts)._gs_features(slim)
    assert {"gs_rays", "cam_view", "cam_view_proj"} <= set(feats2)
    np.testing.assert_allclose(
        np.asarray(feats2["cam_view"]), np.asarray(feats["cam_view"]), atol=1e-5
    )


def test_dataset_prepare_gs_cameras_off_skips_host_chain():
    """With the device camera wire on, the dataset must not burn host CPU on
    the ~37 MB Plücker-ray prep it would immediately discard (advisor r4)."""
    from videomv_tpu.data.datasets import GObjaverseVideoDataset

    f = 4
    cams = orbit_c2w_opengl(f, 15.0, 2.0).reshape(f, 16).astype(np.float32)
    imgs = np.full((f, 3, 16, 16), 0.25, np.float32)
    masks = np.ones((f, 1, 16, 16), np.float32)

    ds = GObjaverseVideoDataset(
        data_list=[], data_dir_list=[],
        gs_settings=GSCameraSettings(input_size=16, output_size=16),
        prepare_gs_cameras=False,
    )
    slim = ds.prepare_gs(cams, imgs, masks)
    assert set(slim) == {"images_output", "masks_output"}

    ds_full = GObjaverseVideoDataset(
        data_list=[], data_dir_list=[],
        gs_settings=GSCameraSettings(input_size=16, output_size=16),
    )
    full = ds_full.prepare_gs(cams, imgs, masks)
    assert {"input", "cam_view", "cam_view_proj", "cam_pos"} <= set(full)
    np.testing.assert_array_equal(full["images_output"], slim["images_output"])
