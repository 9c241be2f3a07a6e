import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from videomv_tpu.data.cameras import GSCameraSettings, orbit_c2w_opengl, prepare_gs_training
from videomv_tpu.ops.gaussian_splat import project_gaussians

rs = np.random.RandomState(0)
N = 393216
g2 = np.zeros((N, 14), np.float32)
g2[:, 0:3] = rs.uniform(-0.7, 0.7, (N, 3))
g2[:, 3] = rs.uniform(0.1, 0.9, N)
g2[:, 4:7] = rs.uniform(0.002, 0.01, (N, 3))
q = rs.randn(N, 4); g2[:, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)
g2[:, 11:14] = rs.uniform(0, 1, (N, 3))
gj = jnp.asarray(g2)
S = 512
st = GSCameraSettings(output_size=S)
cams = prepare_gs_training(orbit_c2w_opengl(4, 0, 2.0), st, ray_size=16)
cv = jnp.asarray(cams["cam_view"][0,0]); cvp = jnp.asarray(cams["cam_view_proj"][0,0])
thf = st.tan_half_fov
P = 1<<21

def bench(name, f, *a):
    o = f(*a); jax.block_until_ready(o)
    t0=time.time(); o = f(*a); jax.block_until_ready(o)
    print(f"{name}: {(time.time()-t0)*1000:.1f}ms", flush=True)
    return o

@jax.jit
def stage_sort_gauss(g):
    pr = project_gaussians(g, cv, cvp, S, thf)
    mean2d, inv_cov, depth, radius, color, opacity, valid = pr
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf))
    return order.sum()
bench("argsort N", stage_sort_gauss, gj)

@jax.jit
def stage_repeat(g):
    counts = jnp.clip((g[:, 3] * 4).astype(jnp.int32), 1, 16)
    pair_g = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts, total_repeat_length=P)
    return pair_g.sum()
bench("repeat->2M", stage_repeat, gj)

@jax.jit
def stage_pair_sort(keys):
    s = jax.lax.sort((keys,), num_keys=1, is_stable=False)[0]
    return s[::1024].sum()
keys = jnp.asarray(rs.randint(0, 1<<30, size=P).astype(np.int32))
bench("sort 2M single-key", stage_pair_sort, keys)

@jax.jit
def stage_pair_sort2(k1, k2):
    a, b = jax.lax.sort((k1, k2), num_keys=1, is_stable=True)
    return a[::1024].sum() + b[::1024].sum()
k2 = jnp.asarray(rs.randint(0, N, size=P).astype(np.int32))
bench("stable sort 2M two-arr", stage_pair_sort2, keys, k2)

@jax.jit
def stage_gather(idx):
    return gj[idx].sum()
idx = jnp.asarray(rs.randint(0, N, size=P).astype(np.int32))
bench("gather 2Mx14", stage_gather, idx)

@jax.jit
def stage_gather_cols(idx):
    out = [gj[idx, c] for c in range(9)]
    return sum(o.sum() for o in out)
bench("gather 2M x9 cols", stage_gather_cols, idx)

@jax.jit
def stage_searchsorted(sorted_keys):
    return jnp.searchsorted(sorted_keys, jnp.arange(1025, dtype=jnp.int32), side="left").sum()
sk = jnp.sort(jnp.asarray(rs.randint(0, 1024, size=P).astype(np.int32)))
bench("searchsorted 1025", stage_searchsorted, sk)
