"""Probe: can the torch reference models be constructed at shipped scale on
the meta device (shape-only, no RAM), and how long does jax.eval_shape of our
flax templates take? Feeds tests/test_shipped_scale_convert.py design."""
import sys, time, types
sys.path.insert(0, "tests")
sys.path.insert(0, ".")

import torch
from reference_oracle import load as load_ref

t0 = time.time()
ref_models = load_ref("core.models")
ref_models.GaussianRenderer = lambda opt: types.SimpleNamespace()


class _DummyLPIPS(torch.nn.Module):
    def __init__(self, *a, **k):
        super().__init__()


ref_models.LPIPS = _DummyLPIPS
ref_t2v = load_ref("tools.modules.unet.unet_t2v")
print(f"oracle import {time.time()-t0:.1f}s", flush=True)

SHIPPED = dict(
    in_dim=4, y_dim=1024, context_dim=1024, out_dim=4,
    dim_mult=[1, 2, 4, 4], num_heads=8, head_dim=64, num_res_blocks=2,
    dropout=0.1, temporal_attention=True, temporal_attn_times=1,
    use_checkpoint=True, use_fps_condition=False, use_camera_condition=True,
    use_lgm_refine=True, use_sim_mask=False, dim=320,
    attn_scales=[1.0, 0.5, 0.25],
)

t0 = time.time()
try:
    with torch.device("meta"):
        m = ref_t2v.UNetSD_T2VBase(**SHIPPED)
    sd = m.state_dict()
    n = sum(v.numel() for v in sd.values())
    print(f"meta ctor OK {time.time()-t0:.1f}s, {len(sd)} keys, {n/1e9:.3f}B params", flush=True)
    lgm_keys = [k for k in sd if k.startswith("lgm_big.")]
    print("lgm_big keys:", len(lgm_keys), flush=True)
except Exception as e:
    print("meta ctor FAILED:", repr(e)[:300], flush=True)
    t0 = time.time()
    m = ref_t2v.UNetSD_T2VBase(**SHIPPED)
    sd = m.state_dict()
    print(f"cpu ctor OK {time.time()-t0:.1f}s, {len(sd)} keys", flush=True)

# flax template timing
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from videomv_tpu.inference.pipeline import unet_kwargs_from_cfg
from videomv_tpu.models import UNetSD_T2VBase

fmod = UNetSD_T2VBase(**unet_kwargs_from_cfg({k: v for k, v in SHIPPED.items()}))
t0 = time.time()
spec = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
tmpl = jax.eval_shape(
    fmod.init, jax.random.PRNGKey(0), spec(1, 4, 2, 8, 8),
    jax.ShapeDtypeStruct((1,), jnp.int32), y=spec(1, 5, 1024),
    camera_data=spec(1, 2, 16),
)
leaves = jax.tree_util.tree_leaves(tmpl)
print(f"eval_shape OK {time.time()-t0:.1f}s, {len(leaves)} leaves, "
      f"{sum(int(np.prod(l.shape)) for l in leaves)/1e9:.3f}B params"
      if (np := __import__('numpy')) else "", flush=True)
