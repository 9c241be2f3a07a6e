"""Profile one CFG UNet step to find the time breakdown."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from videomv_tpu.models import UNetSD_T2VBase
from videomv_tpu.utils.profiling import time_fn, trace, device_memory_stats

model = UNetSD_T2VBase(in_dim=4, dim=320, y_dim=1024, context_dim=1024, out_dim=4,
    dim_mult=(1,2,4,4), num_heads=8, head_dim=64, num_res_blocks=2,
    attn_scales=(1.0,0.5,0.25), dropout=0.1, use_camera_condition=True, dtype=jnp.bfloat16)
b,f,hw = 2,24,32
x = jnp.zeros((b,4,f,hw,hw)); t=jnp.zeros((b,),jnp.int32)
y = jnp.zeros((b,77,1024)); cam=jnp.zeros((b,f,16))
params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, y=y, camera_data=cam)
fwd = jax.jit(lambda p, x, t, y, c: model.apply(p, x, t, y=y, camera_data=c))
print(time_fn(fwd, params, x, t, y, cam, warmup=2, iters=5), flush=True)
print(device_memory_stats(), flush=True)
with trace("workspace/traces"):
    for _ in range(3):
        out = fwd(params, x, t, y, cam)
    jax.block_until_ready(out)
print("trace written", flush=True)
