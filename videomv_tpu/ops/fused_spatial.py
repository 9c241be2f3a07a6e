"""Fully-fused spatial transformer block — one Pallas kernel per (b·f) row.

The stage-1 spatial transformers (C=320, 32×32=1024 tokens, 48 rows per CFG
forward) are the UNet's hottest non-conv path. XLA materializes ~31 MB of
activations to HBM at every op boundary (GN → proj_in → LN → qkv → attn →
out → LN → cross → LN → GEGLU FF → proj_out); this kernel keeps the ENTIRE
block resident in VMEM per row:

  grid (rows,): x row [S, C] streams in, all weights (≈5 MB bf16 at C=320)
  stay VMEM-resident across the whole grid (constant index maps), the row's
  output streams out. HBM traffic ≈ read x + write out + one weight fetch —
  ~6× less than the op-by-op lowering for the stage-1 stack.

Numerics mirror the module path: GroupNorm(32, eps 1e-6) with fp32 stats
(computed via one-hot group matmuls — lane-splitting reshapes are not
available in Mosaic), per-token LayerNorm (eps 1e-5) in fp32, fp32 attention
logits with max-subtraction, bf16 MXU matmuls with fp32 accumulation,
exact-erf GEGLU (rational approximation; Mosaic has no erf lowering).

Reference semantics: SpatialTransformer depth-1 with use_linear=True
(util.py:311-373) wrapping BasicTransformerBlock (util.py:510-540).

Used at inference only (deterministic path; training falls back to the
module composition where dropout lives). Eligibility: C == n_heads·64 ≤ 384,
S a multiple of 512, context present.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_ffn import _erf32, _SQRT2

__all__ = ["fused_spatial_transformer", "spatial_block_reference"]

INTERPRET = False

_Q_CHUNK = 512
_FF_CHUNK = 256


def _layernorm(x32, scale, bias, eps=1e-5):
    m = jnp.mean(x32, axis=-1, keepdims=True)
    v = jnp.mean((x32 - m) ** 2, axis=-1, keepdims=True)
    return (x32 - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _attn(t_bf, ks, vs, wq, wout, bout, *, heads, kv_len, scale):
    """Per-head attention of a [S, I] bf16 input against prepared K/V lists.

    ks/vs: per-head [L, 64] bf16; wq: [heads, I, 64]; wout: [heads, 64, I].
    Returns [S, I] fp32 (out-proj applied, bias added). Logits contract on
    the 64-dim of both operands — no in-kernel transposes."""
    s = t_bf.shape[0]
    i_dim = wout.shape[2]
    L = ks[0].shape[0]
    need_mask = kv_len < L
    if need_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, (_Q_CHUNK, L), 1)
        mask = col < kv_len
    chunks = []
    for c0 in range(0, s, _Q_CHUNK):
        acc = None
        for h in range(heads):
            qh = jax.lax.dot_general(
                t_bf[c0:c0 + _Q_CHUNK], wq[h],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)  # [QC, 64]
            logits = jax.lax.dot_general(
                qh, ks[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [QC, L]
            if need_mask:
                logits = jnp.where(mask, logits, -jnp.inf)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            oc = jax.lax.dot_general(
                p, vs[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)  # [QC, 64]
            contrib = jax.lax.dot_general(
                oc, wout[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [QC, I]
            acc = contrib if acc is None else acc + contrib
        chunks.append(acc)
    out = jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
    return out + bout


def _spatial_kernel(
    x_ref, ctx_ref,
    gn_s, gn_b, win, bin_,
    ln1_s, ln1_b, wq1, wk1, wv1, wo1, bo1,
    ln2_s, ln2_b, wq2, wk2, wv2, wo2, bo2,
    ln3_s, ln3_b, w1a, w1b, b1a, b1b, w2, b2,
    wpo, bpo,
    o_ref,
    *, heads: int, kv_len: int, groups: int,
    rows: int = 1, res_dtype=jnp.float32,
):
    # rows > 1: the block carries `rows` images; the body unrolls over
    # them (VERDICT-r3 #8 experiment — fewer grid cells, bigger DMAs).
    # res_dtype=bf16 narrows the inter-op residual carriers to halve the
    # block's VMEM (the "bf16 residuals" arm; matches the module path's
    # bf16 residual stream, the fp32 default is strictly tighter).
    for rb in range(rows):
        _spatial_row(
            x_ref[rb], ctx_ref[rb if ctx_ref.shape[0] > 1 else 0],
            gn_s, gn_b, win, bin_,
            ln1_s, ln1_b, wq1, wk1, wv1, wo1, bo1,
            ln2_s, ln2_b, wq2, wk2, wv2, wo2, bo2,
            ln3_s, ln3_b, w1a, w1b, b1a, b1b, w2, b2,
            wpo, bpo, o_ref, rb,
            heads=heads, kv_len=kv_len, groups=groups, res_dtype=res_dtype,
        )


def _spatial_row(
    x, ctx,
    gn_s, gn_b, win, bin_,
    ln1_s, ln1_b, wq1, wk1, wv1, wo1, bo1,
    ln2_s, ln2_b, wq2, wk2, wv2, wo2, bo2,
    ln3_s, ln3_b, w1a, w1b, b1a, b1b, w2, b2,
    wpo, bpo,
    o_ref, o_row: int,
    *, heads: int, kv_len: int, groups: int, res_dtype,
):
    s_len, c = x.shape
    scale = (wq1.shape[2]) ** -0.5     # d_head^-0.5

    # ---- GroupNorm(32, eps 1e-6) over (tokens × C/groups) per group, via
    # one-hot group matmuls (no lane-splitting reshape in Mosaic)
    xf = x.astype(jnp.float32)
    per = c // groups
    r_i = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    G = (r_i // per == c_i).astype(jnp.float32)          # [C, groups]
    gsum = jnp.sum(jax.lax.dot_general(
        xf, G, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ), axis=0, keepdims=True)                            # [1, groups]
    gsq = jnp.sum(jax.lax.dot_general(
        xf * xf, G, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ), axis=0, keepdims=True)
    n_el = float(s_len * per)
    gmean = gsum / n_el
    gvar = gsq / n_el - gmean * gmean
    mean_c = jax.lax.dot_general(
        gmean, G, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )                                                    # [1, C]
    rstd_c = jax.lax.dot_general(
        jax.lax.rsqrt(gvar + 1e-6), G, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = (xf - mean_c) * rstd_c * gn_s[...] + gn_b[...]   # [S, C] f32

    # ---- proj_in
    r0 = jax.lax.dot_general(
        h.astype(jnp.bfloat16), win[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bin_[...]                                        # [S, I] f32
    r0 = r0.astype(res_dtype)

    # ---- self-attention (attn1)
    t1 = _layernorm(
        r0.astype(jnp.float32), ln1_s[...], ln1_b[...]).astype(jnp.bfloat16)
    ks1, vs1 = [], []
    for hh in range(heads):
        ks1.append(jax.lax.dot_general(
            t1, wk1[hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16))                          # [S, 64]
        vs1.append(jax.lax.dot_general(
            t1, wv1[hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16))
    r1 = (r0 + _attn(t1, ks1, vs1, wq1[...], wo1[...], bo1[...],
                     heads=heads, kv_len=s_len, scale=scale)).astype(res_dtype)

    # ---- cross-attention (attn2) against the text context ([L, Cc] bf16)
    t2 = _layernorm(
        r1.astype(jnp.float32), ln2_s[...], ln2_b[...]).astype(jnp.bfloat16)
    ks2, vs2 = [], []
    for hh in range(heads):
        ks2.append(jax.lax.dot_general(
            ctx, wk2[hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16))                          # [L, 64]
        vs2.append(jax.lax.dot_general(
            ctx, wv2[hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16))
    r2 = (r1 + _attn(t2, ks2, vs2, wq2[...], wo2[...], bo2[...],
                     heads=heads, kv_len=kv_len, scale=scale)).astype(res_dtype)

    # ---- GEGLU FF, token-chunked so the [chunk, 4C] temps stay small
    ff_chunks = []
    for c0 in range(0, s_len, _FF_CHUNK):
        rc = r2[c0:c0 + _FF_CHUNK]
        t3 = _layernorm(
            rc.astype(jnp.float32), ln3_s[...], ln3_b[...]).astype(jnp.bfloat16)
        lin = jax.lax.dot_general(
            t3, w1a[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1a[...]
        gate = jax.lax.dot_general(
            t3, w1b[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1b[...]
        g = lin * (0.5 * gate * (1.0 + _erf32(gate / _SQRT2)))
        ff_chunks.append(jax.lax.dot_general(
            g.astype(jnp.bfloat16), w2[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2[...])
    r3 = (r2 + (jnp.concatenate(ff_chunks, axis=0)
                if len(ff_chunks) > 1 else ff_chunks[0])).astype(res_dtype)

    # ---- proj_out + outer residual
    y = jax.lax.dot_general(
        r3.astype(jnp.bfloat16), wpo[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bpo[...]
    o_ref[o_row] = (xf + y).astype(o_ref.dtype)


def _split_heads_out(w, heads):
    """Dense kernel [I_in, H*64] -> [H, I_in, 64] (output-column blocks)."""
    i_in = w.shape[0]
    return w.reshape(i_in, heads, 64).transpose(1, 0, 2)


def _split_heads_in(w, heads):
    """Out-proj kernel [H*64, I_out] -> [H, 64, I_out] (input-row blocks)."""
    i_out = w.shape[1]
    return w.reshape(heads, 64, i_out)


def _fst_impl(
    x: jnp.ndarray,        # [R, S, C]
    ctx: jnp.ndarray,      # [R, L, Cc]
    p: dict,               # SpatialTransformer param tree (self.variables)
    n_heads: int,
) -> jnp.ndarray:
    r, s, c = x.shape
    kv_len = ctx.shape[1]
    l_pad = max(128, ((kv_len + 127) // 128) * 128)
    if l_pad != kv_len:
        ctx = jnp.pad(ctx, ((0, 0), (0, l_pad - kv_len), (0, 0)))
    cc = ctx.shape[2]
    tb = p["transformer_blocks_0"]
    ff_inner = tb["ff"]["net_2_kernel"].shape[0]

    bf = jnp.bfloat16

    def row(v):  # 1D param -> [1, D] (2D for VMEM blocks)
        return jnp.asarray(v, jnp.float32)[None, :]

    w1 = tb["ff"]["net_0_proj_kernel"]
    b1 = tb["ff"]["net_0_proj_bias"]
    args = (
        x.astype(bf),
        ctx.astype(bf),
        row(p["norm"]["scale"]), row(p["norm"]["bias"]),
        p["proj_in"]["kernel"].astype(bf), row(p["proj_in"]["bias"]),
        row(tb["norm1"]["scale"]), row(tb["norm1"]["bias"]),
        _split_heads_out(tb["attn1"]["to_q"]["kernel"], n_heads).astype(bf),
        _split_heads_out(tb["attn1"]["to_k"]["kernel"], n_heads).astype(bf),
        _split_heads_out(tb["attn1"]["to_v"]["kernel"], n_heads).astype(bf),
        _split_heads_in(tb["attn1"]["to_out_0"]["kernel"], n_heads).astype(bf),
        row(tb["attn1"]["to_out_0"]["bias"]),
        row(tb["norm2"]["scale"]), row(tb["norm2"]["bias"]),
        _split_heads_out(tb["attn2"]["to_q"]["kernel"], n_heads).astype(bf),
        _split_heads_out(tb["attn2"]["to_k"]["kernel"], n_heads).astype(bf),
        _split_heads_out(tb["attn2"]["to_v"]["kernel"], n_heads).astype(bf),
        _split_heads_in(tb["attn2"]["to_out_0"]["kernel"], n_heads).astype(bf),
        row(tb["attn2"]["to_out_0"]["bias"]),
        row(tb["norm3"]["scale"]), row(tb["norm3"]["bias"]),
        w1[:, :ff_inner].astype(bf), w1[:, ff_inner:].astype(bf),
        row(b1[:ff_inner]), row(b1[ff_inner:]),
        tb["ff"]["net_2_kernel"].astype(bf), row(tb["ff"]["net_2_bias"]),
        p["proj_out"]["kernel"].astype(bf), row(p["proj_out"]["bias"]),
    )

    def const2(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

    # Experiment knobs (VERDICT-r3 #8, measured in scripts/spatial_ab_tpu.py):
    # rows-per-grid-cell and bf16 residual carriers. Defaults reproduce the
    # shipped single-row fp32-residual kernel bit-for-bit.
    import os

    rows = int(os.environ.get("VIDEOMV_FUSED_SPATIAL_ROWS", "1"))
    if rows < 1 or r % rows != 0:
        rows = 1
    res_dtype = (jnp.bfloat16
                 if os.environ.get("VIDEOMV_FUSED_SPATIAL_BF16_RES")
                 else jnp.float32)

    in_specs = [
        pl.BlockSpec((rows, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, l_pad, cc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ] + [const2(a) for a in args[2:]]

    out = pl.pallas_call(
        functools.partial(
            _spatial_kernel, heads=n_heads, kv_len=kv_len, groups=32,
            rows=rows, res_dtype=res_dtype,
        ),
        grid=(r // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, s, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * s * c * c * 8 + 4 * r * s * s * c,
            bytes_accessed=2 * r * s * c * 2,
            transcendentals=r * s * (s + 4 * c),
        ),
        interpret=INTERPRET,
    )(*args)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_spatial_transformer(x, ctx, p, n_heads):
    """Fused spatial transformer block (see module docstring). Differentiable
    via an XLA-recompute VJP (the fused path is deterministic-only, so
    gradients rarely flow here — DDIM inversion is the exception)."""
    return _fst_impl(x, ctx, p, n_heads)


def _fst_fwd(x, ctx, p, n_heads):
    return _fst_impl(x, ctx, p, n_heads), (x, ctx, p)


def _fst_bwd(n_heads, res, g):
    x, ctx, p = res
    _, vjp = jax.vjp(
        lambda x_, c_, p_: spatial_block_reference(x_, c_, p_, n_heads),
        x, ctx, p,
    )
    return vjp(g.astype(x.dtype))


fused_spatial_transformer.defvjp(_fst_fwd, _fst_bwd)


def spatial_block_reference(x, ctx, p, n_heads):
    """Pure-jnp mirror of the module composition (the kernel's oracle)."""
    r, s, c = x.shape
    tb = p["transformer_blocks_0"]
    ff_inner = tb["ff"]["net_2_kernel"].shape[0]
    xf = x.astype(jnp.float32)

    def gn(v):
        g = v.reshape(r, s, 32, c // 32)
        m = g.mean(axis=(1, 3), keepdims=True)
        var = g.var(axis=(1, 3), keepdims=True)
        g = (g - m) * jax.lax.rsqrt(var + 1e-6)
        return g.reshape(r, s, c) * p["norm"]["scale"] + p["norm"]["bias"]

    def ln(v, n):
        m = v.mean(-1, keepdims=True)
        var = v.var(-1, keepdims=True)
        return (v - m) * jax.lax.rsqrt(var + 1e-5) * tb[n]["scale"] + tb[n]["bias"]

    def attn(q_in, kv_in, blk, kv_len=None):
        a = tb[blk]
        d = 64
        q = q_in @ a["to_q"]["kernel"]
        k = kv_in @ a["to_k"]["kernel"]
        v = kv_in @ a["to_v"]["kernel"]
        q = q.reshape(r, -1, n_heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(r, -1, n_heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(r, -1, n_heads, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("rhqd,rhkd->rhqk", q, k) * d ** -0.5
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("rhqk,rhkd->rhqd", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(r, -1, n_heads * d)
        return o @ a["to_out_0"]["kernel"] + a["to_out_0"]["bias"]

    h = gn(xf)
    r0 = h @ p["proj_in"]["kernel"] + p["proj_in"]["bias"]
    r1 = r0 + attn(ln(r0, "norm1"), ln(r0, "norm1"), "attn1")
    r2 = r1 + attn(ln(r1, "norm2"), ctx.astype(jnp.float32), "attn2")
    t3 = ln(r2, "norm3")
    hff = t3 @ tb["ff"]["net_0_proj_kernel"] + tb["ff"]["net_0_proj_bias"]
    lin, gate = hff[..., :ff_inner], hff[..., ff_inner:]
    g = lin * jax.nn.gelu(gate, approximate=False)
    r3 = r2 + (g @ tb["ff"]["net_2_kernel"] + tb["ff"]["net_2_bias"])
    y = r3 @ p["proj_out"]["kernel"] + p["proj_out"]["bias"]
    return (xf + y).astype(x.dtype)


def spatial_fused_eligible(s: int, c: int, inner: int, n_heads: int) -> bool:
    import os

    # A/B on the CFG-pair forward measured a WASH (165.6 fused vs 165.9 ms
    # XLA, scripts/spatial_ab_tpu.py) at +4.5 min compile: the per-row grid
    # serializes the GEMMs at [1024, 320] shapes where XLA batches all 48
    # rows, and the lost MXU utilization cancels the ~2x HBM-traffic saving.
    # Kept as an opt-in experiment (PERF.md "What was tried").
    if not os.environ.get("VIDEOMV_ENABLE_FUSED_SPATIAL"):
        return False
    if jax.default_backend() != "tpu":
        return False
    return (
        inner == c
        and c == n_heads * 64
        and c <= 384
        and c % 32 == 0
        and s % _Q_CHUNK == 0
    )
