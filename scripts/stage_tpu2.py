import sys; sys.path.insert(0, "/root/repo")
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from videomv_tpu.models import UNetSD_T2VBase
model = UNetSD_T2VBase(in_dim=4, dim=320, y_dim=1024, context_dim=1024, out_dim=4,
    dim_mult=(1,2,4,4), num_heads=8, head_dim=64, num_res_blocks=2,
    attn_scales=(1.0,0.5,0.25), dropout=0.1, use_camera_condition=True, dtype=jnp.bfloat16)
b,f,hw = 1,24,32
x0 = jax.random.normal(jax.random.PRNGKey(5), (b,4,f,hw,hw))
t=jnp.full((b,),500,jnp.int32)
y = jax.random.normal(jax.random.PRNGKey(6), (b,77,1024))*0.1
cam=jax.random.normal(jax.random.PRNGKey(8), (b,f,16))
params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, t, y=y, camera_data=cam)
jax.block_until_ready(params)
print("init ok", flush=True)

N = 20
@jax.jit
def chain(p, x, t, y, c):
    def body(x, _):
        out = model.apply(p, x, t, y=y, camera_data=c)
        return x + 0.01 * out, None   # data-dependent chain
    x, _ = jax.lax.scan(body, x, None, length=N)
    return jnp.sum(x)

t0=time.time(); s = chain(params, x0, t, y, cam); s.block_until_ready()
print(f"chain compile+run {time.time()-t0:.1f}s sum={float(s):.3f}", flush=True)
for _ in range(2):
    t0=time.time(); s = chain(params, x0, t, y, cam); s.block_until_ready()
    dt = time.time()-t0
    print(f"chain {dt:.3f}s -> {dt/N*1000:.1f} ms/fwd", flush=True)

# CFG-batched (2 rows) version — what sampling actually runs
@jax.jit
def chain_cfg(p, x, t, y, c):
    y2 = jnp.concatenate([y, jnp.zeros_like(y)], 0)
    c2 = jnp.concatenate([c, c], 0)
    t2 = jnp.concatenate([t, t], 0)
    def body(x, _):
        x2 = jnp.concatenate([x, x], 0)
        out = model.apply(p, x2, t2, y=y2, camera_data=c2)
        return x + 0.01*(out[:b] + 2.0*(out[:b]-out[b:])), None
    x, _ = jax.lax.scan(body, x, None, length=N)
    return jnp.sum(x)

t0=time.time(); s = chain_cfg(params, x0, t, y, cam); s.block_until_ready()
print(f"cfg chain compile+run {time.time()-t0:.1f}s", flush=True)
for _ in range(2):
    t0=time.time(); s = chain_cfg(params, x0, t, y, cam); s.block_until_ready()
    dt = time.time()-t0
    print(f"cfg chain {dt:.3f}s -> {dt/N*1000:.1f} ms/cfg-step", flush=True)
