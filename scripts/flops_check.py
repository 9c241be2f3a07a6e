import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from videomv_tpu.models import UNetSD_T2VBase
model = UNetSD_T2VBase(in_dim=4, dim=320, y_dim=1024, context_dim=1024, out_dim=4,
    dim_mult=(1,2,4,4), num_heads=8, head_dim=64, num_res_blocks=2,
    attn_scales=(1.0,0.5,0.25), dropout=0.1, use_camera_condition=True, dtype=jnp.bfloat16)
b,f,hw = 2,24,32
x = jnp.zeros((b,4,f,hw,hw)); t=jnp.zeros((b,),jnp.int32)
y = jnp.zeros((b,77,1024)); cam=jnp.zeros((b,f,16))
params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, y=y, camera_data=cam)
lowered = jax.jit(lambda p, x, t, y, c: model.apply(p, x, t, y=y, camera_data=c)).lower(params, x, t, y, cam)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list): ca = ca[0]
fl = ca.get("flops", 0)
print(f"flops/fwd: {fl/1e12:.2f} TF; at 156ms measured -> {fl/0.1562/1e12:.0f} TF/s vs v5e peak 197 TF/s bf16 -> {fl/0.1562/197e12*100:.0f}% MXU util", flush=True)
print("bytes accessed:", ca.get("bytes accessed", 0)/1e9, "GB", flush=True)
