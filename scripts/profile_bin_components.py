"""Component-level timing of the splat binning prep on TPU."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

N = 65536
P = 1 << 19
NT = 257  # 256 tiles + sentinel

rng = np.random.RandomState(0)
depth = jnp.asarray(rng.rand(N).astype(np.float32))
counts = jnp.asarray(rng.randint(0, 9, N).astype(np.int32))
tile_id_r = jnp.asarray(rng.randint(0, NT, P).astype(np.int32))
pair_idx = jnp.arange(P, dtype=jnp.int32)
attrs = jnp.asarray(rng.randn(N, 16).astype(np.float32))
pair_g = jnp.asarray(rng.randint(0, N, P).astype(np.int32))


def timeit(name, f, *args):
    g = jax.jit(f)
    o = g(*args); jax.tree_util.tree_map(lambda x: x.block_until_ready(), o)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        o = g(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), o)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.2f} ms", flush=True)


timeit("argsort N=65k", lambda d: jnp.argsort(d), depth)
timeit("gather attrs by order [N,16]", lambda a, o: a[o], attrs, jnp.argsort(depth))
timeit("repeat->P", lambda c: jnp.repeat(jnp.arange(N, dtype=jnp.int32), c,
                                         total_repeat_length=P), counts)
timeit("sort uint32 P", lambda k: jax.lax.sort(k),
       (tile_id_r.astype(jnp.uint32) << 19) | pair_idx.astype(jnp.uint32))
timeit("sort 2-key P", lambda t, g: jax.lax.sort((t, g), num_keys=1, is_stable=True),
       tile_id_r, pair_g)
timeit("pair gather [P] int", lambda g, i: g[i], pair_g, pair_idx)
timeit("payload gather+T [16,P]", lambda a, s: (a[s].T * 1.0), attrs, pair_g)
timeit("searchsorted", lambda t: jnp.searchsorted(t, jnp.arange(NT, dtype=jnp.int32)),
       jnp.sort(tile_id_r))

# the whole prep via the real code
from videomv_tpu.ops.gaussian_splat import project_gaussians
from videomv_tpu.ops.splat_pallas import _bin_pairs

g = np.zeros((N, 14), np.float32)
g[:, 0:3] = rng.uniform(-0.6, 0.6, (N, 3))
g[:, 3] = 0.7
g[:, 4:7] = 0.01
g[:, 7] = 1.0
g[:, 11:14] = 0.5
gj = jnp.asarray(g)
cv = jnp.eye(4); cv = cv.at[3, 2].set(2.0)  # rough view
import numpy as _np
tan = float(_np.tan(_np.deg2rad(39.6 / 2)))
proj_f = jax.jit(lambda gg: project_gaussians(gg, cv, cv, 256, tan))
timeit("project N", proj_f, gj)

def prep(gg):
    pr = project_gaussians(gg, cv, cv, 256, tan)
    p, ts, tc, _ = _bin_pairs(*pr, img_size=256, max_pairs=P, max_span=16)
    return p, ts, tc
timeit("full prep 1 view", prep, gj)
