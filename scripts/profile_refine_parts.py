"""Time the non-splat parts of one GS-refine step on TPU with data-dependent
chains (the axon tunnel's block_until_ready can return early — CLAUDE.md)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from videomv_tpu.models import LGM, LGMOptions
from videomv_tpu.models.autoencoder import AutoencoderKL

dt = jnp.bfloat16
vae = AutoencoderKL(dtype=dt)
lgm = LGM(opt=LGMOptions.big(), dtype=dt)

r1, r2 = jax.random.split(jax.random.PRNGKey(0))
vae_params = jax.jit(vae.init)(r1, jnp.zeros((1, 3, 256, 256)))
lgm_params = jax.jit(lgm.init)(r2, jnp.zeros((1, 4, 9, 256, 256)))

N_CHAIN = 6


def timeit(name, make_chain, params, x):
    chain = jax.jit(make_chain)
    s = float(chain(params, x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(chain(params, x))
        best = min(best, (time.perf_counter() - t0) / N_CHAIN)
    print(f"{name}: {best*1000:.0f} ms", flush=True)


def enc_chain(p, x):
    def body(x, _):
        z = vae.apply(p, x, 0.18215, method=vae.encode_first_stage)
        return x + 1e-12 * jnp.mean(z.astype(jnp.float32)).astype(x.dtype), None
    x, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
    return jnp.sum(x.astype(jnp.float32))


def dec_chain(p, z):
    def body(z, _):
        img = vae.apply(p, z, method=vae.decode)
        return z + 1e-12 * jnp.mean(img.astype(jnp.float32)).astype(z.dtype), None
    z, _ = jax.lax.scan(body, z, None, length=N_CHAIN)
    return jnp.sum(z.astype(jnp.float32))


def lgm_chain(p, x):
    def body(x, _):
        gs = lgm.apply(p, x)
        return x + 1e-12 * jnp.mean(gs.astype(jnp.float32)).astype(x.dtype), None
    x, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
    return jnp.sum(x.astype(jnp.float32))


timeit("vae encode 48x256^2", enc_chain, vae_params, jnp.zeros((48, 3, 256, 256), dt))
timeit("vae decode 8x32^2->256^2", dec_chain, vae_params, jnp.zeros((8, 4, 32, 32), dt))
timeit("lgm fwd 2 scenes", lgm_chain, lgm_params, jnp.zeros((2, 4, 9, 256, 256), dt))
