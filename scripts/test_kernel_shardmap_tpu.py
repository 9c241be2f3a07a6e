"""Pallas kernels under shard_map on REAL TPU (1-device mesh).

The CPU suite proves the sharded-trace kernel semantics in interpret mode
(tests/test_kernel_sharding.py); this script proves the Mosaic compile
path — pallas_call lowered INSIDE shard_map — works on hardware, using a
1-device mesh (the only mesh this environment can build). Shapes are the
production spatial-attention / FFN hot shapes.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from videomv_tpu.ops import attention as attn_mod
from videomv_tpu.ops.serving_mesh import serving_kernel_mesh

print("backend:", jax.default_backend(), flush=True)
mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=("sp",))

# --- flash attention at the bench hot shape (48 rows, 1024 tokens) -------
b, s, h, d = 48, 1024, 8, 64
rng = jax.random.PRNGKey(0)
q, k, v = (
    jax.random.normal(jax.random.fold_in(rng, i), (b, s, h, d), jnp.bfloat16)
    for i in range(3)
)
want = jax.jit(attn_mod._reference_attention)(q, k, v)
t0 = time.time()
with serving_kernel_mesh(mesh, "sp", "frame"):
    got = jax.jit(attn_mod.dot_product_attention)(q, k, v)
got, want = jax.block_until_ready((got, want))
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
print(f"flash-attn under shard_map: max|err|={err:.5f} ({time.time()-t0:.0f}s)",
      flush=True)
assert err < 0.02, err

# --- fused FFN at the stage-1 hot shape ----------------------------------
from videomv_tpu.models.blocks import FeedForward

ff = FeedForward(dim=320, frame_dim=0, dtype=jnp.bfloat16)
x = jax.random.normal(jax.random.fold_in(rng, 9), (48, 1024, 320), jnp.bfloat16)
params = ff.init(jax.random.PRNGKey(2), x)
base = jax.jit(lambda p, xx: ff.apply(p, xx))(params, x)  # fused, unwrapped
t0 = time.time()
with serving_kernel_mesh(mesh, "sp", "frame"):
    got = jax.jit(lambda p, xx: ff.apply(p, xx))(params, x)
got, base = jax.block_until_ready((got, base))
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - base.astype(jnp.float32))))
print(f"fused-FFN under shard_map: max|err|={err:.5f} ({time.time()-t0:.0f}s)",
      flush=True)
assert err == 0.0, err  # same kernel, same shard = bitwise
print("OK", flush=True)
