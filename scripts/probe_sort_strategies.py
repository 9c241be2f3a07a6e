"""Probe: per-view batched (vmapped) uint32 sort vs ONE flat sort with the
view id in the high key bits.  The splat binning currently vmaps a
[G, P] sort over G=8 view groups; profile_splat_groups showed XLA's batched
sort DEGRADING with G (28.4 ms/view at G=48).  If the degradation is
per-pass overhead, a single flat sort of G*P keys (view|tile|gid packed in
<=32 bits, per-view segments stay 512-aligned when P%512==0) could beat it.

Also probes the sort at reduced capacities to re-confirm cost ~ capacity.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)


def time_chained_u32(step_fn, x0, n=20, repeats=3):
    """Data-dependent chain for uint32 ops (sorts): xor-fold the output so
    each iteration depends on the last, defeating the tunnel's unreliable
    block_until_ready. The key distribution stays uniform under xor."""
    @jax.jit
    def chain(x):
        def body(x, _):
            y = step_fn(x)
            return x ^ (y >> 1), None
        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x)

    int(chain(x0))  # device_get is the only reliable sync through the tunnel
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        int(chain(x0))
        best = min(best, (time.perf_counter() - t0) / n)
    return best

P = 294912          # 4.5 * 65536, the refine capacity (512-multiple)
N_TILES = 257       # 256 tiles + sentinel
GID_BITS = 16       # 65536 gaussians
rng = np.random.default_rng(0)


def make_keys(G):
    tile = rng.integers(0, N_TILES, size=(G, P), dtype=np.uint32)
    gid = rng.integers(0, 1 << GID_BITS, size=(G, P), dtype=np.uint32)
    return jnp.asarray((tile << GID_BITS) | gid)


def bench(f, x, n=30):
    return time_chained_u32(f, x, n=n)


for G in (8, 16, 48):
    keys = make_keys(G)

    t_b = bench(lambda k: jax.vmap(jax.lax.sort)(k), keys)
    print(f"G={G:2d} batched vmap sort: {t_b*1e3:7.2f} ms  ({t_b/G*1e3:.2f} ms/view)", flush=True)

    vbits = max(1, (G - 1).bit_length())
    assert (G - 1) << (9 + GID_BITS) < (1 << 32) or vbits + 9 + GID_BITS <= 32

    def flat(k, G=G):
        view = (jnp.arange(G, dtype=jnp.uint32) << (9 + GID_BITS))[:, None]
        fk = (k + view).reshape(-1)
        s = jax.lax.sort(fk)
        return s.reshape(G, P) & ((1 << (9 + GID_BITS)) - 1)

    t_f = bench(flat, keys)
    print(f"G={G:2d} flat single sort:  {t_f*1e3:7.2f} ms  ({t_f/G*1e3:.2f} ms/view)", flush=True)

# capacity sweep at G=8 batched (current default shape)
for cap in (294912, 262144, 229376, 196608):
    tile = rng.integers(0, N_TILES, size=(8, cap), dtype=np.uint32)
    gid = rng.integers(0, 1 << GID_BITS, size=(8, cap), dtype=np.uint32)
    k = jnp.asarray((tile << GID_BITS) | gid)
    t = bench(lambda x: jax.vmap(jax.lax.sort)(x), k)
    print(f"cap={cap}: batched sort {t*1e3:7.2f} ms ({t/8*1e3:.2f} ms/view)", flush=True)
