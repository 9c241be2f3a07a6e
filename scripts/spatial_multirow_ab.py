"""Multi-row fused-spatial A/B (VERDICT-r3 #8, PERF roadmap #1's last
forward-path lever): XLA control vs the fused kernel at rows-per-cell
{1, 2} x residual dtype {fp32, bf16}, on the CFG-pair forward.

One process: the knobs are trace-time env vars, so each arm builds a
fresh jit. Numerical faithfulness of every arm is covered by
tests/test_pallas_kernels.py::TestFusedSpatial.
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
x = jnp.zeros((b,4,f,hw,hw)); t = jnp.zeros((b,), jnp.int32)
y = jnp.zeros((b,77,1024)); cam = jnp.zeros((b,f,16))
t0 = time.time()
params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, y=y, camera_data=cam)
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

    @jax.jit
    def chain(p, x):
        def body(x, _):
            return x + 0.01 * model.apply(p, x, t, y=y, camera_data=cam).astype(x.dtype), None
        x, _ = jax.lax.scan(body, x, None, length=10)
        return jnp.sum(x)

    try:
        t0 = time.time()
        s = float(chain(params, x))
        print(f"{name:20s}: compile+first {time.time()-t0:.0f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(chain(params, x))
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"{name:20s}: CFG-pair fwd {best*1000:.1f} ms", flush=True)
    except Exception as e:  # VMEM OOM arms report and continue
        print(f"{name:20s}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

for k in KNOBS:
    os.environ.pop(k, None)
