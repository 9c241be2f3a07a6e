import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from videomv_tpu.models import UNetSD_T2VBase

N = 20
model = UNetSD_T2VBase(in_dim=4, dim=320, y_dim=1024, context_dim=1024, out_dim=4,
    dim_mult=(1,2,4,4), num_heads=8, head_dim=64, num_res_blocks=2,
    attn_scales=(1.0,0.5,0.25), dropout=0.1, use_camera_condition=True, dtype=jnp.bfloat16)
b,f,hw = 2,24,32
x0 = jax.random.normal(jax.random.PRNGKey(5), (b,4,f,hw,hw))
t=jnp.full((b,),500,jnp.int32)
y = jax.random.normal(jax.random.PRNGKey(6), (b,77,1024))*0.1
cam=jax.random.normal(jax.random.PRNGKey(8), (b,f,16))
params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, t, y=y, camera_data=cam)

@jax.jit
def chain(p, x):
    def body(x, _):
        out = model.apply(p, x, t, y=y, camera_data=cam)
        return x + 0.01 * out, None
    x, _ = jax.lax.scan(body, x, None, length=N)
    return jnp.sum(x)

def measure(p, tag):
    s = chain(p, x0); s.block_until_ready()
    best=1e9
    for _ in range(3):
        t0=time.time(); s = chain(p, x0); s.block_until_ready()
        best=min(best,(time.time()-t0)/N)
    print(f"{tag}: {best*1000:.1f} ms/fwd sum={float(s):.3f}", flush=True)

measure(params, "fp32 params")
p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
measure(p16, "bf16 params")
