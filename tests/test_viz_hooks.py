"""In-training visualization hooks.

The I2V viz must be batch-conditioned (reference train_i2v_enterance.py:301-327
builds visual_kwards from the live batch tensors) — a prompt-file T2V pipeline
cannot drive an I2V UNet, which previously made the hook a silent no-op. This
test drives TrainEngine.i2v_viz directly and asserts output actually lands on
disk (the hook swallows exceptions by design, so the file IS the assertion).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from videomv_tpu.config import AttrDict
from videomv_tpu.diffusion import GaussianDiffusion
from videomv_tpu.models import UNetSD_I2VGen
from videomv_tpu.models.autoencoder import AutoencoderKL
from videomv_tpu.training.engine import T2VTrainer


def test_i2v_viz_writes_output(tmp_path):
    eng = T2VTrainer.__new__(T2VTrainer)
    eng.cfg = AttrDict({
        "viz_num": 1,
        "ddim_timesteps": 3,
        "visual_train": {"guide_scale": 6.0},
        "seed": 0,
    })
    eng.unet = UNetSD_I2VGen(
        in_dim=4, dim=64, y_dim=48, context_dim=32, out_dim=4, dim_mult=(1, 2),
        num_heads=2, head_dim=16, num_res_blocks=1, attn_scales=(1.0,),
        dropout=0.0, use_camera_condition=True,
    )
    eng.vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    eng.diffusion = GaussianDiffusion(
        schedule="linear_sd",
        schedule_param=dict(num_timesteps=50, init_beta=0.00085, last_beta=0.0120),
        mean_type="eps", var_type="fixed_small",
    )
    eng.scale_factor = 0.18215
    eng._i2v_viz_fn = None

    b, f, hw = 1, 2, 8
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(rng, (b, 4, f, hw, hw))
    y = jax.random.normal(rng, (b, 3, 32))
    cam = jnp.zeros((b, f, 16))
    local = jax.random.normal(rng, (b, 4, 1, hw, hw))
    img_emb = jax.random.normal(rng, (b, 48))
    unet_params = jax.jit(eng.unet.init)(
        jax.random.PRNGKey(1), lat, jnp.zeros((b,), jnp.int32), y=y,
        camera_data=cam, local_image=local, image=img_emb,
    )
    eng.params = {
        "vae": jax.jit(eng.vae.init)(
            jax.random.PRNGKey(2), jnp.zeros((1, 3, hw * 2, hw * 2))
        )
    }
    eng.zero_y = jnp.zeros((1, 3, 32))

    feats = {
        "latents": lat, "y_words": y, "camera_data": cam,
        "local_image": local, "image_embed": img_emb,
    }
    eng.i2v_viz(1, unet_params, feats, ["a test asset"], str(tmp_path))

    out = glob.glob(os.path.join(str(tmp_path), "viz", "*"))
    assert out, "i2v_viz produced no output file (hook silently failed)"
