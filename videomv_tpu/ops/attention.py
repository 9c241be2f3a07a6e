"""Multi-head attention primitives for the UNet transformers.

The reference runs spatial/temporal attention through xformers
memory-efficient attention with fp32 logits (util.py:212-268, 376-427).
Here the hot path is a Pallas TPU flash-attention kernel
(``videomv_tpu.ops.flash_attention``); this module provides the public
``dot_product_attention`` entry point which dispatches to the Pallas kernel
on TPU when shapes are kernel-friendly and to a fused XLA reference
implementation otherwise (CPU tests, tiny shapes).

Layout convention: ``q, k, v`` are ``[batch, seq, heads, head_dim]`` (BSHD),
the layout XLA prefers for fusing the surrounding projections.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention"]


def _reference_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused XLA attention with fp32 softmax (matches reference numerics:
    ATTN_PRECISION=fp32 in util.py:376-412)."""
    dim = q.shape[-1]
    scale = dim ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits.astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.named_call, name="dot_product_attention")
def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, S, H, D] tensors.

    Dispatches to the Pallas TPU flash-attention kernel when running on TPU
    with kernel-friendly shapes (seq multiple of the block size, no
    bias/mask), otherwise falls back to the XLA reference path.
    """
    if bias is None and mask is None and _pallas_eligible(q, k):
        try:
            from .flash_attention import flash_attention
            from .serving_mesh import kernel_specs_for, shard_map_kernel
        except ImportError:
            pass
        else:
            # sharded serving trace: run the kernel per shard under
            # shard_map (exact — each (batch·head) grid cell is
            # independent; dim 0 is the frames-in-batch axis and dim 2 the
            # heads axis for every pallas-eligible attention in this model)
            km = kernel_specs_for(q.shape, frame_dim=0, head_dim=2)
            if km is not None:
                mesh, spec = km
                return shard_map_kernel(
                    flash_attention, mesh, (spec, spec, spec)
                )(q, k, v)
            from .serving_mesh import serving_ctx_active

            if not serving_ctx_active():
                return flash_attention(q, k, v)
            # serving mesh active but no dim can shard: the bare custom
            # call would face GSPMD unwrapped — take the XLA path
    return _reference_attention(q, k, v, bias=bias, mask=mask)


def _pallas_eligible(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    import os

    if os.environ.get("VIDEOMV_DISABLE_PALLAS_ATTN"):
        return False
    if jax.default_backend() != "tpu":
        return False
    # A/B-measured policy: the kernel wins only for long self-attention
    # (seq >= 256, q == k). Cross-attn via the kernel (kv 77 padded to 128)
    # and short sequences measured SLOWER than the fused XLA path
    # (164.5 vs 156.2 ms/fwd) — padding waste + lost fusion around small
    # attentions. Tiny temporal attention (24 tokens) stays dense too.
    q_seq, k_seq = q.shape[1], k.shape[1]
    head_dim = q.shape[-1]
    return q_seq >= 256 and k_seq >= 128 and head_dim in (64, 128) and q_seq == k_seq
