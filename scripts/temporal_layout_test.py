"""A/B: current temporal transformer (materialized (b h w) f c transposes)
vs a layout-preserving variant attending over F via batched einsum."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

C, HEADS, DH = 640, 10, 64
B, F, S = 2, 24, 256  # 16x16 level

class CurrentTT(nn.Module):
    @nn.compact
    def __call__(self, x):  # [B,F,H,W,C] with H*W=S
        b, f, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        h = h.transpose(0, 2, 3, 1, 4).reshape(b*hh*ww, f, c)
        h = nn.Dense(HEADS*DH, name="proj_in")(h)
        # self-attn
        q = nn.Dense(HEADS*DH, use_bias=False, name="to_q")(h)
        k = nn.Dense(HEADS*DH, use_bias=False, name="to_k")(h)
        v = nn.Dense(HEADS*DH, use_bias=False, name="to_v")(h)
        bb, s, _ = q.shape
        q = q.reshape(bb, s, HEADS, DH); k = k.reshape(bb, s, HEADS, DH); v = v.reshape(bb, s, HEADS, DH)
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits.astype(jnp.float32)*(DH**-0.5), -1).astype(v.dtype)
        o = jnp.einsum('bhqk,bkhd->bqhd', p, v).reshape(bb, s, HEADS*DH)
        h = h + nn.Dense(HEADS*DH, name="to_out")(o)
        # FF
        ff = nn.Dense(HEADS*DH*4, name="ff_up")(h)
        h = h + nn.Dense(HEADS*DH, name="ff_dn")(jax.nn.gelu(ff))
        h = nn.Dense(c, name="proj_out")(h)
        h = h.reshape(b, hh, ww, f, c).transpose(0, 3, 1, 2, 4)
        return x + h

class FastTT(nn.Module):
    @nn.compact
    def __call__(self, x):  # [B,F,H,W,C] — no full-tensor transposes
        b, f, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        h = h.reshape(b, f, hh*ww, c)
        h = nn.Dense(HEADS*DH, name="proj_in")(h)
        q = nn.Dense(HEADS*DH, use_bias=False, name="to_q")(h)
        k = nn.Dense(HEADS*DH, use_bias=False, name="to_k")(h)
        v = nn.Dense(HEADS*DH, use_bias=False, name="to_v")(h)
        q = q.reshape(b, f, hh*ww, HEADS, DH)
        k = k.reshape(b, f, hh*ww, HEADS, DH)
        v = v.reshape(b, f, hh*ww, HEADS, DH)
        logits = jnp.einsum('bfshd,bgshd->bshfg', q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits.astype(jnp.float32)*(DH**-0.5), -1).astype(v.dtype)
        o = jnp.einsum('bshfg,bgshd->bfshd', p, v).reshape(b, f, hh*ww, HEADS*DH)
        h = h + nn.Dense(HEADS*DH, name="to_out")(o)
        ff = nn.Dense(HEADS*DH*4, name="ff_up")(h)
        h = h + nn.Dense(HEADS*DH, name="ff_dn")(jax.nn.gelu(ff))
        h = nn.Dense(c, name="proj_out")(h)
        return x + h.reshape(b, f, hh, ww, c)

x0 = jax.random.normal(jax.random.PRNGKey(0), (B, F, 16, 16, C), jnp.bfloat16)
for name, cls in [("current", CurrentTT), ("fast", FastTT)]:
    m = cls()
    p = jax.jit(m.init)(jax.random.PRNGKey(1), x0)
    @jax.jit
    def chain(p, x):
        def body(x, _):
            return x + 0.01*m.apply(p, x).astype(x.dtype), None
        x, _ = jax.lax.scan(body, x, None, length=30)
        return jnp.sum(x.astype(jnp.float32))
    float(chain(p, x0))
    best=1e9
    for _ in range(3):
        t0=time.time(); float(chain(p, x0)); best=min(best,(time.time()-t0)/30)
    print(f"{name}: {best*1000:.2f} ms/block", flush=True)
