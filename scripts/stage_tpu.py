"""Staged TPU timing probe: matmul → full-size UNet init → forward."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
print("devices", jax.devices(), flush=True)

t0=time.time()
x = jnp.zeros((1024, 1024), jnp.bfloat16)
y = jax.jit(lambda a: a @ a)(x); y.block_until_ready()
print(f"matmul compile+run {time.time()-t0:.1f}s", flush=True)

from videomv_tpu.models import UNetSD_T2VBase
model = UNetSD_T2VBase(in_dim=4, dim=320, y_dim=1024, context_dim=1024, out_dim=4,
    dim_mult=(1,2,4,4), num_heads=8, head_dim=64, num_res_blocks=2,
    attn_scales=(1.0,0.5,0.25), dropout=0.1, use_camera_condition=True, dtype=jnp.bfloat16)
b,f,hw = 1,24,32
x = jnp.zeros((b,4,f,hw,hw)); t=jnp.zeros((b,),jnp.int32)
y = jnp.zeros((b,77,1024)); cam=jnp.zeros((b,f,16))
t0=time.time()
params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, y=y, camera_data=cam)
jax.block_until_ready(params)
import numpy as np
n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
print(f"init {time.time()-t0:.1f}s params {n/1e9:.3f}B", flush=True)

fwd = jax.jit(lambda p, x, t, y, c: model.apply(p, x, t, y=y, camera_data=c))
t0=time.time()
out = fwd(params, x, t, y, cam); out.block_until_ready()
print(f"fwd compile+first-run {time.time()-t0:.1f}s", flush=True)
for i in range(3):
    t0=time.time(); out = fwd(params, x, t, y, cam); out.block_until_ready()
    print(f"fwd steady {time.time()-t0:.4f}s", flush=True)
