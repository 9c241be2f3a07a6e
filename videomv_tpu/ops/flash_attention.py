"""Pallas TPU attention kernel for the UNet's spatial transformers.

The hot attention shape is the spatial self-attention over H·W=1024 tokens
for 48 (= 24 views × 2 CFG rows) batch rows × 5-20 heads (SURVEY.md §3.3).
A naive XLA lowering materializes [B, H, S, S] logits in HBM; this kernel
keeps the whole softmax(QKᵀ)V pipeline in VMEM per (batch·head, q-block)
grid cell: Q-block and full K/V tiles stream HBM→VMEM once, logits live
only on-chip, softmax runs in fp32 on the VPU, both matmuls hit the MXU in
bf16 with fp32 accumulation.

For the sequence lengths in this model (≤1024) a single K/V pass per grid
cell fits comfortably in VMEM (1024×64 bf16 = 128 KB), so no online-softmax
chunking is needed — this is the memory-optimal schedule, not a literal
port of the flash-attention loop.

Backward: custom VJP recomputing through the XLA reference path (correct,
fused by XLA; a dedicated Pallas backward is a later perf pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

# interpret-mode switch: lets the CPU test suite execute the kernel body
# (tests/test_pallas_kernels.py); always False in production
INTERPRET = False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [S, D]
    v = v_ref[0]  # [S, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, S] fp32
    s = s * scale
    if kv_len < k.shape[0]:
        # cross-attention with padded KV: mask the pad columns
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_fwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q, k, v: [B, Sq, H, D] -> [B, Sq, H, D]. KV length may be unpadded
    (e.g. 77 text tokens); it is zero-padded to a lane multiple here and
    masked inside the kernel."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = d ** -0.5

    kv_len = sk
    sk_pad = max(128, ((sk + 127) // 128) * 128)
    if sk_pad != sk:
        pad = [(0, 0), (0, sk_pad - sk), (0, 0), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        sk = sk_pad

    # [B*H, S, D] layout for the kernel grid
    qh = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kh = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vh = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)

    block_q = min(512, sq)
    n_q = sq // block_q
    assert sq % block_q == 0

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=kv_len),
        grid=(b * h, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sq * sk * d,
            bytes_accessed=(qh.size + kh.size + vh.size) * q.dtype.itemsize * 2,
            transcendentals=b * h * sq * sk,
        ),
        interpret=INTERPRET,
    )(qh, kh, vh)

    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _reference(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * (d ** -0.5), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


@jax.custom_vjp
def flash_attention(q, k, v):
    return _flash_fwd(q, k, v)


def _fwd(q, k, v):
    return _flash_fwd(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_reference, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
