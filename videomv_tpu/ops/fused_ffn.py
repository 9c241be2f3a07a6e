"""Fused GEGLU feed-forward Pallas kernel for the transformer blocks.

The UNet's spatial/temporal transformer FF (reference GEGLU+FeedForward,
util.py:543-577) is the single largest HBM consumer in the denoiser forward:
XLA cannot fuse across the two GEMMs, so the [T, 2·4C] GEGLU intermediate
round-trips HBM twice per block (~1 GB per stage-1 block at the bench
shapes; PERF.md roofline). This kernel keeps the intermediate VMEM-resident
per token tile:

  grid (token_tiles, inner_tiles), inner minor:
    lin  = x_tile @ W1[:, :I][:, j]  + b1_lin[j]     (MXU, fp32 accum)
    gate = x_tile @ W1[:, I:][:, j]  + b1_gate[j]
    acc += (lin · gelu_exact(gate)) @ W2[j, :]        (MXU)
  write acc + b2 at the last inner tile.

The x tile and accumulator stay resident across the inner tiles (their
block index is constant in j), so HBM traffic is one read of x, one write
of the output, and one weight stream per token tile. Eligibility is gated
on C (weight restreaming beats XLA's intermediate traffic only while the
weight tile stream stays small relative to T·8C — measured policy, keep
only where it wins; see PERF.md).

Backward: custom VJP through the XLA reference path (training uses the
unfused module path anyway — dropout is only live there).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["geglu_ffn", "geglu_ffn_reference"]

# interpret-mode switch for the CPU test suite (tests/test_pallas_kernels.py)
INTERPRET = False

_SQRT2 = math.sqrt(2.0)


def geglu_ffn_reference(x, w1, b1, w2, b2):
    """XLA reference: GEGLU(x@w1+b1) @ w2 + b2 (exact-erf gelu gate)."""
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    lin, gate = jnp.split(h, 2, axis=-1)
    g = lin * jax.nn.gelu(gate, approximate=False)
    return jnp.dot(g.astype(w2.dtype), w2, preferred_element_type=jnp.float32).astype(
        x.dtype
    ) + b2.astype(x.dtype)


def _erf32(x):
    """Abramowitz–Stegun 7.1.26 rational erf approximation (|err| < 1.5e-7,
    well under bf16 activation resolution). Mosaic has no `erf` lowering
    (only exp), so the kernel carries its own."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _ffn_kernel(
    x_ref, w1a_ref, w1b_ref, w2_ref, b1a_ref, b1b_ref, b2_ref,
    o_ref, acc_ref, *, n_inner: int,
):
    j = pl.program_id(1)
    x = x_ref[...]
    lin = jax.lax.dot_general(
        x, w1a_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1a_ref[...]
    gate = jax.lax.dot_general(
        x, w1b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1b_ref[...]
    # exact-erf gelu (reference torch F.gelu; ADVICE round-1)
    g = lin * (0.5 * gate * (1.0 + _erf32(gate / _SQRT2)))
    part = jax.lax.dot_general(
        g.astype(w2_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(j == n_inner - 1)
    def _emit():
        o_ref[...] = (acc_ref[...] + b2_ref[...]).astype(o_ref.dtype)


def _pick_tiles(t: int, c: int, inner: int):
    """Token/inner tile sizes keeping temps + weight tiles within ~10 MB."""
    tt = min(1024, t)
    it = inner
    # temps: lin+gate fp32 [tt, it] ×2 ≤ 6 MB; weight tiles 3·c·it·2 ≤ 4 MB
    while it > 256 and (tt * it * 8 > 6 * 2**20 or 6 * c * it > 4 * 2**20):
        it //= 2
    return tt, it


def _ffn_fwd(x, w1, b1, w2, b2):
    t, c = x.shape
    inner = w2.shape[0]
    tt, it = _pick_tiles(t, c, inner)

    pad_t = (-t) % tt
    if pad_t:
        x = jnp.pad(x, ((0, pad_t), (0, 0)))
    n_token = x.shape[0] // tt
    assert inner % it == 0, (inner, it)
    n_inner = inner // it

    w1a, w1b = w1[:, :inner], w1[:, inner:]
    b1a, b1b = b1[None, :inner], b1[None, inner:]
    b2r = b2[None, :]

    out = pl.pallas_call(
        functools.partial(_ffn_kernel, n_inner=n_inner),
        grid=(n_token, n_inner),
        in_specs=[
            pl.BlockSpec((tt, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, it), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, it), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((it, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, it), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, it), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tt, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], c), x.dtype),
        scratch_shapes=[pltpu.VMEM((tt, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * c * inner * 3,
            bytes_accessed=2 * t * c * x.dtype.itemsize
            + (w1.size + w2.size) * w1.dtype.itemsize * n_token,
            transcendentals=t * inner,
        ),
        interpret=INTERPRET,
    )(x, w1a, w1b, w2, b1a, b1b, b2r)
    return out[:t] if pad_t else out


@jax.custom_vjp
def geglu_ffn(x, w1, b1, w2, b2):
    """x [T, C] → [T, C]: fused GEGLU FF. Weights: w1 [C, 2I], b1 [2I],
    w2 [I, C], b2 [C] (I = lin/gate half width)."""
    return _ffn_fwd(x, w1, b1, w2, b2)


def _fwd(x, w1, b1, w2, b2):
    return _ffn_fwd(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _bwd(res, g):
    _, vjp = jax.vjp(geglu_ffn_reference, *res)
    return vjp(g.astype(res[0].dtype))


geglu_ffn.defvjp(_fwd, _bwd)


def ffn_eligible(t: int, c: int, inner: int, dtype=jnp.bfloat16) -> bool:
    import os

    if os.environ.get("VIDEOMV_DISABLE_FUSED_FFN"):
        return False
    if jax.default_backend() != "tpu":
        return False
    # bf16 only: _pick_tiles sizes the VMEM budget for 2-byte weight tiles;
    # under fp32 the same tiles are 2× the bytes and the kernel dies with
    # "Scoped allocation with size 24.90M and limit 16.00M" (the round-3
    # fp32 acceptance path, workspace/logs/psnr_drift_r3b.log). The fp32
    # path is an acceptance escape hatch where XLA's fused composition is
    # the right answer anyway — don't re-tile, just skip.
    if jnp.dtype(dtype) != jnp.dtype(jnp.bfloat16):
        return False
    # weight restreaming (3·C·I bytes per token tile) must stay well under
    # XLA's intermediate round-trips (~T·8C·bf16·2rw): wins measured for the
    # high-token stages; the C=1280 low-token stages break even — skip
    return c <= 640 and t >= 4 * 1024 and inner % 256 == 0
