"""A/B the two train-step knobs added in round 3 (full-size UNet, bs=2,
f=24, adafactor, donated — the production path of train_bench_tpu.py):

  1. baseline              (threefry dropout bits, remat_policy=full)
  2. prng_impl=rbg         (hardware RngBitGenerator for dropout masks)
  3. remat_policy=dots_no_batch (GEMM outputs survive to the backward)
  4. both

Each variant is one tunnel compile; variants that OOM are reported and
skipped (dots policies keep more residents — they may not fit 16 GB at
bs=2 alongside fp32 params + adafactor state).
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

print("backend:", jax.default_backend(), flush=True)

B, F, HW = 2, 24, 32
diffusion = GaussianDiffusion(
    schedule="linear_sd",
    schedule_param=dict(num_timesteps=1000, init_beta=0.00085, last_beta=0.0120),
    mean_type="eps", var_type="fixed_small",
)
mesh = make_mesh(1)
lat = jnp.zeros((B, 4, F, HW, HW))
y = jnp.zeros((B, 77, 1024))
cam = jnp.zeros((B, F, 16))
batch = {"latents": lat, "y_words": y, "camera_data": cam}
sb = shard_batch(mesh, batch)
rng = jax.random.PRNGKey(1)

VARIANTS = [
    ("baseline", dict(remat_policy="full"), None),
    ("rbg-dropout", dict(remat_policy="full"), "rbg"),
    ("dots_no_batch", dict(remat_policy="dots_no_batch"), None),
    ("rbg+dots_no_batch", dict(remat_policy="dots_no_batch"), "rbg"),
]

for name, mkw, prng in VARIANTS:
    t0 = time.time()
    try:
        model = UNetSD_T2VBase(
            in_dim=4, dim=320, y_dim=1024, context_dim=1024, out_dim=4,
            dim_mult=(1, 2, 4, 4), num_heads=8, head_dim=64, num_res_blocks=2,
            attn_scales=(1.0, 0.5, 0.25), dropout=0.1, use_camera_condition=True,
            use_checkpoint=True, dtype=jnp.bfloat16, **mkw,
        )
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), lat, jnp.zeros((B,), jnp.int32),
            y=y, camera_data=cam)
        optimizer = optax.adafactor(3e-5)
        opt_state = jax.jit(optimizer.init)(params)
        step_fn = build_train_step(
            model, diffusion, optimizer, mesh, use_ema=False, prng_impl=prng)
        st = TrainState(step=jnp.zeros((), jnp.int32),
                        params=replicate(mesh, params),
                        opt_state=replicate(mesh, opt_state), ema_params=None)
        del params, opt_state
        st, loss = step_fn(st, sb, rng)
        jax.block_until_ready(loss)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(8):
            t1 = time.perf_counter()
            st, loss = step_fn(st, sb, rng)
            jax.block_until_ready(loss)
            best = min(best, time.perf_counter() - t1)
        print(f"{name:20s}: {best*1000:7.1f} ms/step  (compile {compile_s:.0f}s, "
              f"loss {float(loss):.4f})", flush=True)
        del st
    except Exception as e:  # noqa: BLE001 — OOM/compile failures are data here
        print(f"{name:20s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
