"""Stage breakdown + MFU roofline for the full-size train step (VERDICT r2
#4).  Probes, ordered to keep peak HBM under the v5e's 16 GB (fp32 params
are 5.65 GB and exactly one copy can be live at a time):

  A: fwd-only loss (bs=2 and bs=1)          — no donation needed
  C: full train step, adafactor, donated    — the production path
  B: fwd+bwd + zero-SGD update, donated     — isolates the optimizer:
     C - B = adafactor update cost; B - A - ~14 ms (the 2x5.6 GB param
     read+write of the zero-SGD) = bwd(+remat recompute)
  D (--remat-ab): B at bs=1 without use_checkpoint — prices the remat
     recompute directly (bs=2 without remat does not fit)

An undonated value_and_grad OOMs even at bs=1 (fp32 params + fp32 grads +
bf16 cast + activations), hence the zero-SGD probe shape.  MFU comes from
the compiled cost analysis of B against the 197 TFLOP/s bf16 peak.

Each cold probe is one tunnel compile (~5-30 min) — run in background.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import optax

from videomv_tpu.diffusion import GaussianDiffusion
from videomv_tpu.models import UNetSD_T2VBase
from videomv_tpu.parallel import TrainState, build_train_step, make_mesh, replicate, shard_batch
from videomv_tpu.parallel.train_step import make_t2v_apply

print("backend:", jax.default_backend(), flush=True)
REMAT_AB = "--remat-ab" in sys.argv

B, F, HW = 2, 24, 32
PEAK = 197e12


def build(use_checkpoint=True):
    return UNetSD_T2VBase(
        in_dim=4, dim=320, y_dim=1024, context_dim=1024, out_dim=4,
        dim_mult=(1, 2, 4, 4), num_heads=8, head_dim=64, num_res_blocks=2,
        attn_scales=(1.0, 0.5, 0.25), dropout=0.1, use_camera_condition=True,
        use_checkpoint=use_checkpoint, dtype=jnp.bfloat16,
    )


diffusion = GaussianDiffusion(
    schedule="linear_sd",
    schedule_param=dict(num_timesteps=1000, init_beta=0.00085, last_beta=0.0120),
    mean_type="eps", var_type="fixed_small",
)
mesh = make_mesh(1)
model = build(True)
lat = jnp.zeros((B, 4, F, HW, HW))
y = jnp.zeros((B, 77, 1024))
cam = jnp.zeros((B, F, 16))
params = jax.jit(model.init)(
    jax.random.PRNGKey(0), lat, jnp.zeros((B,), jnp.int32), y=y, camera_data=cam)
batch = {"latents": lat, "y_words": y, "camera_data": cam}
batch1 = {"latents": lat[:1], "y_words": y[:1], "camera_data": cam[:1]}
rng = jax.random.PRNGKey(1)
n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
print(f"params: {n_params/1e9:.3f}B", flush=True)


def loss_of(model):
    apply_fn = make_t2v_apply(model)

    def loss_fn(params, batch, rng):
        b = batch["latents"].shape[0]
        t_rng, n_rng, d_rng = jax.random.split(rng, 3)
        t = jax.random.randint(t_rng, (b,), 0, diffusion.num_timesteps)

        def model_fn(xt, ts):
            return apply_fn(params, xt, ts, batch["y_words"], batch, d_rng)

        loss_vec, _ = diffusion.loss(n_rng, model_fn, batch["latents"], t)
        return loss_vec.mean()

    return loss_fn


def timeit(f, *args, n=6):
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit_donated(f, state0, *rest, n=6):
    """f(state, *rest) -> (state', aux) with state donated: thread it."""
    st = state0
    st, aux = f(st, *rest)
    jax.block_until_ready(aux)
    best = float("inf")
    for _ in range(n):
        t1 = time.perf_counter()
        st, aux = f(st, *rest)
        jax.block_until_ready(aux)
        best = min(best, time.perf_counter() - t1)
    return best, st


loss_fn = loss_of(model)

# ─── A: fwd-only ────────────────────────────────────────────────────────
t0 = time.time()
fwd = jax.jit(loss_fn)
fwd_t = timeit(fwd, params, batch, rng)
print(f"A  fwd-only loss bs=2:  {fwd_t*1000:7.1f} ms  (compile {time.time()-t0-fwd_t:.0f}s)", flush=True)
fwd1_t = timeit(fwd, params, batch1, rng)
print(f"A1 fwd-only loss bs=1:  {fwd1_t*1000:7.1f} ms", flush=True)

# ─── C: full production step (donates its state) ────────────────────────
t0 = time.time()
optimizer = optax.adafactor(3e-5)
opt_state = jax.jit(optimizer.init)(params)
step_fn = build_train_step(model, diffusion, optimizer, mesh, use_ema=False)
state = TrainState(step=jnp.zeros((), jnp.int32),
                   params=replicate(mesh, params),
                   opt_state=replicate(mesh, opt_state), ema_params=None)
del params, opt_state  # exactly one fp32 copy may be live
sb = shard_batch(mesh, batch)


def stepc(st, b, r):
    st2, loss = step_fn(st, b, r)
    return st2, loss


st = state
st, loss = stepc(st, sb, rng)
jax.block_until_ready(loss)
comp_c = time.time() - t0
c_t, st = timeit_donated(stepc, st, sb, rng)
print(f"C  full step bs=2 (adafactor, donated): {c_t*1000:7.1f} ms  (compile {comp_c:.0f}s)", flush=True)

params = st.params  # adafactor-drifted values; fine for timing probes
del st, state

# ─── B: fwd+bwd + zero-SGD (donated) ────────────────────────────────────
t0 = time.time()


def zero_sgd(params, batch, rng):
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
    new_params = jax.tree_util.tree_map(lambda p, g: p - 0.0 * g, params, grads)
    return new_params, loss


fwdbwd = jax.jit(zero_sgd, donate_argnums=0)
# AOT-compile once; call the compiled executable directly (donation honored)
compiled = fwdbwd.lower(params, batch, rng).compile()
ca = compiled.cost_analysis()
flops = (ca or {}).get("flops", float("nan"))
b_t, p2 = timeit_donated(compiled, params, batch, rng)
comp_b = time.time() - t0 - b_t * 7
print(f"B  fwd+bwd+0-sgd bs=2 (remat, donated): {b_t*1000:7.1f} ms  (compile ~{comp_b:.0f}s)", flush=True)
print(f"   cost_analysis flops: {flops/1e12:.1f} TFLOP", flush=True)
print(f"   bwd(+remat recompute) = B - A - ~14ms = {(b_t-fwd_t)*1000-14:.1f} ms", flush=True)
print(f"   adafactor update      = C - B        = {(c_t-b_t)*1000:.1f} ms", flush=True)
print(f"   MFU fwd+bwd: {flops/b_t/PEAK*100:.1f}%   full step: {flops/c_t/PEAK*100:.1f}%", flush=True)

params = p2

# ─── D: remat off at bs=1 ───────────────────────────────────────────────
if REMAT_AB:
    lf1 = loss_of(build(True))

    def zsgd_of(lf):
        def f(params, batch, rng):
            loss, grads = jax.value_and_grad(lf)(params, batch, rng)
            return jax.tree_util.tree_map(lambda p, g: p - 0.0 * g, params, grads), loss
        return f

    f_on = jax.jit(zsgd_of(lf1), donate_argnums=0)
    t_on, params = timeit_donated(f_on, params, batch1, rng)
    print(f"D  remat=True  fwd+bwd+0-sgd bs=1: {t_on*1000:7.1f} ms", flush=True)

    lf0 = loss_of(build(False))
    f_off = jax.jit(zsgd_of(lf0), donate_argnums=0)
    t_off, params = timeit_donated(f_off, params, batch1, rng)
    print(f"D  remat=False fwd+bwd+0-sgd bs=1: {t_off*1000:7.1f} ms", flush=True)
    print(f"   remat recompute at bs=1 = {(t_on-t_off)*1000:.1f} ms", flush=True)
