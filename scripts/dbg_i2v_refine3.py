"""Stage-3 NaN bisect: unroll the 3-step DDIM loop with the i2v tiny
diffusion (cosine + zero_terminal_snr + v-pred) and find the NaN op."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from videomv_tpu.config import load_inference_config
from videomv_tpu.diffusion import GaussianDiffusion
from videomv_tpu.diffusion.samplers import (
    _ddim_update, _guided_prediction, _pred_x0, ddim_timestep_seq,
)

cfg = load_inference_config("configs/i2vgen_xl_infer_tiny.yaml")
d = dict(cfg.get("Diffusion", {})); d.pop("type", None)
diffusion = GaussianDiffusion(**d)
p = diffusion.params
print("acp[0,1,334,667,999]:", [float(p.alphas_cumprod[i]) for i in (0, 1, 334, 667, 999)])
print("recip finite:", [bool(np.isfinite(p.sqrt_recip_alphas_cumprod[i])) for i in (1, 334, 667, 999)])
print("recipm1 [1,334,667]:", [float(p.sqrt_recipm1_alphas_cumprod[i]) for i in (1, 334, 667)])

steps = ddim_timestep_seq(diffusion.num_timesteps, 3)
print("steps:", steps)
stride = diffusion.num_timesteps // 3

b = 1
xt = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 4, 4))

def model_fn(x, t):
    z = jnp.zeros_like(x)
    return z, z  # zero-init UNet CFG pair

for s in steps:
    t = jnp.full((b,), int(s), jnp.int32)
    out = _guided_prediction(diffusion, model_fn, xt, t, 6.0)
    x0 = _pred_x0(diffusion, out, xt, t, None, None, False)
    z = jnp.zeros_like(xt)
    xt = _ddim_update(diffusion, x0, xt, t, stride, 0.0, z)
    print(f"t={int(s)}: out fin={bool(jnp.isfinite(out).all())} "
          f"x0 fin={bool(jnp.isfinite(x0).all())} "
          f"xt fin={bool(jnp.isfinite(xt).all())} "
          f"|xt|max={float(jnp.max(jnp.abs(xt))):.3e}")
