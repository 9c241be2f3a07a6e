import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from videomv_tpu.ops.flash_attention import flash_attention, _reference

rs = np.random.RandomState(0)
for shape_q, shape_kv in [((4, 1024, 5, 64), (4, 1024, 5, 64)),
                          ((2, 256, 8, 64), (2, 77, 8, 64))]:
    q = jnp.asarray(rs.randn(*shape_q), jnp.bfloat16)
    k = jnp.asarray(rs.randn(*shape_kv), jnp.bfloat16)
    v = jnp.asarray(rs.randn(*shape_kv), jnp.bfloat16)
    out_k = jax.jit(flash_attention)(q, k, v)
    out_r = jax.jit(_reference)(q, k, v)
    err = float(jnp.abs(out_k.astype(jnp.float32) - out_r.astype(jnp.float32)).max())
    print(f"q{shape_q} kv{shape_kv}: max err {err:.2e}", flush=True)
    # gradient path (custom vjp through reference)
    g = jax.jit(jax.grad(lambda q: jnp.sum(flash_attention(q, k, v).astype(jnp.float32))))(q)
    print(f"  grad finite: {bool(jnp.isfinite(g.astype(jnp.float32)).all())}", flush=True)
