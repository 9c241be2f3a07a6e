import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from videomv_tpu.models import UNetSD_T2VBase

def analyze(name, **kw):
    model = UNetSD_T2VBase(in_dim=4, dim=320, y_dim=1024, context_dim=1024, out_dim=4,
        dim_mult=(1,2,4,4), num_heads=8, head_dim=64, num_res_blocks=2,
        dropout=0.1, use_camera_condition=True, dtype=jnp.bfloat16, **kw)
    b,f,hw = 2,24,32
    x = jnp.zeros((b,4,f,hw,hw)); t=jnp.zeros((b,),jnp.int32)
    y = jnp.zeros((b,77,1024)); cam=jnp.zeros((b,f,16))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, y=y, camera_data=cam)
    c = jax.jit(lambda p, x, t, y, c: model.apply(p, x, t, y=y, camera_data=c)).lower(params, x, t, y, cam).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    print(f"{name}: {ca.get('flops',0)/1e12:.2f} TF, {ca.get('bytes accessed',0)/1e9:.1f} GB", flush=True)

analyze("full", attn_scales=(1.0,0.5,0.25))
analyze("no temporal", attn_scales=(1.0,0.5,0.25), temporal_attention=False)
analyze("convs only", attn_scales=(), temporal_attention=False)
