"""Root-cause the second tunnel compile of the donated-state refine step.

PERF.md roadmap #7 blames "fed-back donated-state layouts" for the extra
~300 s compile a fresh process pays on its SECOND refine/train step call.
That was inferred from timing; this probe asks JAX directly: tiny shapes on
the real backend, ``jax_explain_cache_misses`` + ``jax_log_compiles`` on,
three step calls, print the per-call wall time and whatever JAX says about
any tracing-cache miss.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_explain_cache_misses", True)
jax.config.update("jax_log_compiles", True)
import jax.numpy as jnp
import numpy as np
import optax

from videomv_tpu.data.cameras import GSCameraSettings, orbit_c2w_opengl, prepare_gs_training
from videomv_tpu.diffusion import GaussianDiffusion
from videomv_tpu.models import UNetSD_T2VBase
from videomv_tpu.models.lgm import LGM, LGMOptions
from videomv_tpu.parallel import make_mesh, make_t2v_apply, replicate, shard_batch
from videomv_tpu.training.lgm_refine import LGMTrainState, build_lgm_refine_step

print("backend:", jax.default_backend(), flush=True)

TINY_LGM = LGMOptions(
    input_size=16, down_channels=(32, 64), down_attention=(False, True),
    mid_attention=True, up_channels=(64, 32), up_attention=(True, False),
    splat_size=16, output_size=16, num_input_views=2,
)

mesh = make_mesh(len(jax.devices()))
f, hw, S = 4, 16, 16
unet = UNetSD_T2VBase(
    in_dim=4, dim=32, y_dim=16, context_dim=16, out_dim=4, dim_mult=(1,),
    num_heads=1, head_dim=32, num_res_blocks=1, attn_scales=(1.0,),
    dropout=0.0, use_camera_condition=False, temporal_attention=False,
)
from videomv_tpu.models.autoencoder import AutoencoderKL

vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
lgm = LGM(opt=TINY_LGM)
diffusion = GaussianDiffusion(
    schedule="linear_sd",
    schedule_param=dict(num_timesteps=100, init_beta=0.00085, last_beta=0.0120),
    mean_type="eps", var_type="fixed_small",
)

b = len(jax.devices())
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

opt = optax.adamw(1e-4)
state = LGMTrainState(
    step=jnp.zeros((), jnp.int32),
    lgm_params=replicate(mesh, lgm_params),
    opt_state=replicate(mesh, jax.jit(opt.init)(lgm_params)),
)
step_fn = build_lgm_refine_step(
    make_t2v_apply(unet), vae, lgm, diffusion, opt, mesh,
    n_input_views=2, n_supervise_extra=1,
    render_size=R, splat_backend="auto",
)
frozen = (replicate(mesh, unet_params), replicate(mesh, vae_params))
sbatch = shard_batch(mesh, batch)

for i in range(3):
    t0 = time.time()
    state, loss, aux = step_fn(state, frozen, sbatch, rng)
    _ = float(loss)  # real sync (CLAUDE.md: block_until_ready can lie)
    print(f"call {i}: {time.time()-t0:.1f}s loss={float(loss):.4f}", flush=True)
print("done", flush=True)
