"""A/B the fully-fused spatial-transformer kernel on the CFG-pair forward.

Run twice: VIDEOMV_DISABLE_FUSED_SPATIAL=1 (XLA control) vs unset (fused).
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from videomv_tpu.models import UNetSD_T2VBase

model = UNetSD_T2VBase(in_dim=4, dim=320, y_dim=1024, context_dim=1024, out_dim=4,
    dim_mult=(1,2,4,4), num_heads=8, head_dim=64, num_res_blocks=2,
    attn_scales=(1.0,0.5,0.25), dropout=0.1, use_camera_condition=True,
    dtype=jnp.bfloat16)
b, f, hw = 2, 24, 32  # CFG pair
x = jnp.zeros((b,4,f,hw,hw)); t = jnp.zeros((b,), jnp.int32)
y = jnp.zeros((b,77,1024)); cam = jnp.zeros((b,f,16))
t0 = time.time()
params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, y=y, camera_data=cam)
jax.block_until_ready(params)
print(f"init {time.time()-t0:.0f}s", flush=True)

mode = os.environ.get("VIDEOMV_DISABLE_FUSED_SPATIAL", "") and "XLA-SPATIAL" or "FUSED-SPATIAL"

@jax.jit
def chain(p, x):
    def body(x, _):
        return x + 0.01 * model.apply(p, x, t, y=y, camera_data=cam).astype(x.dtype), None
    x, _ = jax.lax.scan(body, x, None, length=10)
    return jnp.sum(x)

t0 = time.time()
s = float(chain(params, x))  # host fetch: the tunnel's block_until_ready returns early
print(f"compile+first {time.time()-t0:.0f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    s = float(chain(params, x))
    best = min(best, (time.perf_counter() - t0) / 10)
print(f"{mode}: CFG-pair fwd {best*1000:.1f} ms", flush=True)
