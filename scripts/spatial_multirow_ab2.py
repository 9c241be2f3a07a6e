"""Multi-row fused-spatial A/B, take 2 (VERDICT-r3 #8).

The scan-of-10 chain used by spatial_multirow_ab.py repeatably crashes the
tunnel's tpu_compile_helper for every multi-row arm (6/6 failures across
two runs at different times, while rows=1 and control compile fine, and the
SAME rows=2 program compiles fine as a bare forward — see
workspace/logs/{spatial_multirow_r4*,multirow_probe2}.log). So this script
chains data-dependence in a Python loop over the bare single-forward jit:
x <- x + 0.01*f(x), 10 iterations per timing, which the tunnel's early
block_until_ready cannot elide. Dispatch overhead is shared by all arms.
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from videomv_tpu.models import UNetSD_T2VBase

print("backend:", jax.default_backend(), flush=True)

model = UNetSD_T2VBase(in_dim=4, dim=320, y_dim=1024, context_dim=1024, out_dim=4,
    dim_mult=(1,2,4,4), num_heads=8, head_dim=64, num_res_blocks=2,
    attn_scales=(1.0,0.5,0.25), dropout=0.1, use_camera_condition=True,
    dtype=jnp.bfloat16)
b, f, hw = 2, 24, 32  # CFG pair
x0 = jnp.zeros((b,4,f,hw,hw)); t = jnp.zeros((b,), jnp.int32)
y = jnp.zeros((b,77,1024)); cam = jnp.zeros((b,f,16))
t0 = time.time()
params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, t, y=y, camera_data=cam)
jax.block_until_ready(params)
print(f"init {time.time()-t0:.0f}s", flush=True)

ARMS = [
    ("xla-control",        {}),
    ("fused rows=1 fp32",  {"VIDEOMV_ENABLE_FUSED_SPATIAL": "1"}),
    ("fused rows=2 fp32",  {"VIDEOMV_ENABLE_FUSED_SPATIAL": "1",
                            "VIDEOMV_FUSED_SPATIAL_ROWS": "2"}),
    ("fused rows=2 bf16r", {"VIDEOMV_ENABLE_FUSED_SPATIAL": "1",
                            "VIDEOMV_FUSED_SPATIAL_ROWS": "2",
                            "VIDEOMV_FUSED_SPATIAL_BF16_RES": "1"}),
    ("fused rows=4 bf16r", {"VIDEOMV_ENABLE_FUSED_SPATIAL": "1",
                            "VIDEOMV_FUSED_SPATIAL_ROWS": "4",
                            "VIDEOMV_FUSED_SPATIAL_BF16_RES": "1"}),
]
KNOBS = ("VIDEOMV_ENABLE_FUSED_SPATIAL", "VIDEOMV_FUSED_SPATIAL_ROWS",
         "VIDEOMV_FUSED_SPATIAL_BF16_RES")

for name, env in ARMS:
    for k in KNOBS:
        os.environ.pop(k, None)
    os.environ.update(env)

    fwd = jax.jit(lambda p, x: model.apply(p, x, t, y=y, camera_data=cam))

    try:
        t0 = time.time()
        x = x0 + 0.01 * fwd(params, x0).astype(x0.dtype)
        jax.block_until_ready(x)
        print(f"{name:20s}: compile+first {time.time()-t0:.0f}s", flush=True)
        best = 1e9
        for _ in range(3):
            x = x0
            t1 = time.perf_counter()
            for _ in range(10):
                x = x + 0.01 * fwd(params, x).astype(x.dtype)
            jax.block_until_ready(x)
            best = min(best, (time.perf_counter() - t1) / 10)
        print(f"{name:20s}: CFG-pair fwd {best*1000:.1f} ms", flush=True)
    except Exception as e:  # VMEM OOM arms report and continue
        print(f"{name:20s}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

for k in KNOBS:
    os.environ.pop(k, None)
