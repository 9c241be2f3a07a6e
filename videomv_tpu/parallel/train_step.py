"""Data-parallel diffusion training step under GSPMD.

Replaces the reference train-loop core (train_t2v_enterance.py:237-323):
AMP GradScaler → native bf16 compute with fp32 master params and adamw
state; DDP gradient hooks → GSPMD-inserted psum; sharded EMA dict →
a plain replicated EMA pytree updated with a fused lerp.

``build_train_step`` returns one jitted function implementing:
  noise/q_sample → denoiser forward (bf16) → mse vs target → grads (fp32)
  → optax update → EMA lerp — all sharded batch-wise over the ``dp`` axis.

The denoiser is injected as ``apply_fn(params, xt, t, y, batch, rng)`` so
the same step serves T2V (y + camera) and I2V (+ local_image/image
conditioning) — see ``make_t2v_apply`` / ``make_i2v_apply``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any]


def make_t2v_apply(unet):
    """Standard text+camera conditioning (train_t2v_enterance.py:286-296)."""

    def apply_fn(params, xt, t, y, batch, rng):
        return unet.apply(
            params, xt, t, y=y, camera_data=batch.get("camera_data"),
            deterministic=False, rngs={"dropout": rng},
        )

    return apply_fn


def make_i2v_apply(unet):
    """I2V conditioning: + reference-frame latent and CLIP image embedding
    (train_i2v_enterance.py local_image path, SURVEY.md §2 #7)."""

    def apply_fn(params, xt, t, y, batch, rng):
        return unet.apply(
            params, xt, t, y=y, camera_data=batch.get("camera_data"),
            local_image=batch["local_image"], image=batch.get("image_embed"),
            deterministic=False, rngs={"dropout": rng},
        )

    return apply_fn


def build_train_step(
    unet_or_apply,
    diffusion,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    ema_decay: float = 0.9999,
    use_ema: bool = True,
    p_zero: float = 0.1,
    zero_y=None,
    state_shardings=None,
    prng_impl: Optional[str] = None,
):
    """Create the jitted DP train step.

    batch dict: ``latents`` [B, 4, F, h, w] (pre-encoded by the frozen VAE),
    ``y_words`` [B, L, ctx], optional ``camera_data``/``local_image``/
    ``image_embed``. Classifier-free dropout of the text condition happens
    in-step with probability ``p_zero`` (train_t2v_enterance.py:266-276).

    ``zero_y`` [1, L, ctx] is the CLIP embedding of the *negative prompt* —
    the reference substitutes it (``zero_y_negative``) for dropped rows
    (train_t2v_enterance.py:173-175,274), matching the uncond row that CFG
    inference uses. ``None`` falls back to literal zeros.

    ``prng_impl``: PRNG used for the DROPOUT bit streams only (config key
    ``prng_impl``; e.g. ``'rbg'``). The default threefry generates mask
    bits with vector ALU hashing at every dropout site — a measurable
    slice of the bf16 forward; ``'rbg'`` uses the hardware
    RngBitGenerator. Sampling rngs (t, noise, cfg-drop) stay threefry so
    loss streams stay reproducible across this switch at p_dropout=0.

    ``state_shardings``: optional ``TrainState``-shaped pytree of
    ``NamedSharding`` (see ``mesh.fsdp_shardings``). When given, the state
    lives sharded over the mesh (ZeRO-style fully-sharded data parallel —
    GSPMD inserts the per-layer all-gathers and grad reduce-scatters);
    when ``None``, params/opt-state are replicated as before.
    """
    if callable(unet_or_apply) and not hasattr(unet_or_apply, "apply"):
        apply_fn = unet_or_apply
    else:
        apply_fn = make_t2v_apply(unet_or_apply)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))

    def loss_fn(params, batch, rng):
        latents = batch["latents"]
        b = latents.shape[0]
        t_rng, n_rng, z_rng, d_rng = jax.random.split(rng, 4)
        if prng_impl:
            # re-seat the dropout stream on a faster generator; the key
            # material derives deterministically from the step rng at full
            # width (an int32 seed would cap the run at 2^31 distinct
            # dropout streams — birthday collisions by ~50k steps)
            kd = jax.random.bits(
                d_rng, jax.random.key_data(jax.random.key(0, impl=prng_impl)).shape,
                dtype=jnp.uint32,
            )
            d_rng = jax.random.wrap_key_data(kd, impl=prng_impl)
        t = jax.random.randint(t_rng, (b,), 0, diffusion.num_timesteps)

        # classifier-free dropout: dropped rows become the negative-prompt
        # embedding (reference zero_y_negative), so train-time uncond matches
        # the CFG uncond row used at inference
        drop = jax.random.bernoulli(z_rng, p_zero, (b,))
        uncond = 0.0 if zero_y is None else jnp.asarray(zero_y, batch["y_words"].dtype)
        y = jnp.where(drop[:, None, None], uncond, batch["y_words"])

        def model_fn(xt, ts):
            return apply_fn(params, xt, ts, y, batch, d_rng)

        loss_vec, aux = diffusion.loss(n_rng, model_fn, latents, t)
        return loss_vec.mean(), aux

    state_sh = repl if state_shardings is None else state_shardings

    @functools.partial(
        jax.jit,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if use_ema and state.ema_params is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + (1.0 - ema_decay) * p,
                state.ema_params, new_params,
            )
        return (
            TrainState(state.step + 1, new_params, new_opt, new_ema),
            loss,
        )

    return train_step
