"""UNet block zoo for the 3D video UNets, in Flax linen (NHWC layout).

Re-designs the reference block library (tools/modules/unet/util.py) for TPU:
  - activations carried as ``[B*F, H, W, C]`` (NHWC — native for XLA conv)
  - attention through ``videomv_tpu.ops.dot_product_attention`` (Pallas flash
    kernel on TPU, fp32-softmax XLA fallback elsewhere)
  - temporal convs as 3D convs over ``[B, F, H, W, C]`` with (3,1,1) kernels
    which XLA lowers onto the MXU as batched matmuls.

Parameter naming mirrors the torch module paths (``in_layers_0`` ↔
``in_layers.0`` …) so released ``.pth`` checkpoints map over mechanically
(see videomv_tpu/training/checkpoints.py).

Block ↔ reference map:
  SpatialTransformer      ↔ util.py:311-373   (use_linear=True variant)
  TemporalTransformer     ↔ util.py:992-1089  (conv1d proj variant)
  BasicTransformerBlock   ↔ util.py:510-540
  CrossAttention          ↔ util.py:212-268 (xformers MemoryEfficientCrossAttention)
  FeedForward/GEGLU       ↔ util.py:543-577
  ResBlock                ↔ util.py:610-730 (with fused TemporalConvBlock_v2)
  TemporalConvBlockV2     ↔ util.py:1347-1392
  Upsample / Downsample   ↔ util.py:579-607, 732-756
  sinusoidal_embedding    ↔ util.py:177-189 (cos-first convention!)
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention

Dtype = Any

default_kernel_init = nn.initializers.lecun_normal()


def sinusoidal_embedding(timesteps: jnp.ndarray, dim: int) -> jnp.ndarray:
    """[B] -> [B, dim]; concatenates cos then sin (reference util.py:177-189)."""
    half = dim // 2
    t = timesteps.astype(jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = jnp.outer(t, freqs)
    x = jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)
    if dim % 2 != 0:
        x = jnp.concatenate([x, jnp.zeros_like(x[:, :1])], axis=1)
    return x


class TimestepMLP(nn.Module):
    """Linear -> SiLU -> Linear embedding tower (time/fps/camera embeddings,
    reference unet_t2v.py:141-161). ``zero_init`` zeroes the last layer as the
    camera/fps embeddings do."""

    embed_dim: int
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="0")(x)
        x = nn.silu(x)
        last_init = (
            dict(kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
            if self.zero_init
            else {}
        )
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="2", **last_init)(x)
        return x


class CrossAttention(nn.Module):
    """Multi-head (cross-)attention with fp32 softmax.

    Parameter layout matches MemoryEfficientCrossAttention (util.py:212-268):
    ``to_q/to_k/to_v`` without bias, ``to_out_0`` with bias.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        attn_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        b, s_q = q.shape[0], q.shape[1]
        s_kv = k.shape[1]
        q = q.reshape(b, s_q, self.heads, self.dim_head)
        k = k.reshape(b, s_kv, self.heads, self.dim_head)
        v = v.reshape(b, s_kv, self.heads, self.dim_head)

        out = dot_product_attention(q, k, v, mask=attn_mask)
        out = out.reshape(b, s_q, inner)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        # reference GEGLU uses torch F.gelu — the exact erf form (util.py:556)
        return x * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU MLP (util.py:560-577, glu=True as used by the transformers).

    Parameters are declared flat with torch-joined names
    (``net_0_proj_kernel`` ↔ torch ``net.0.proj.weight`` — the converter and
    the SD-key grad-scale matcher both operate on '_'-joined paths, so the
    flat layout is checkpoint-identical) so the SAME tree serves two compute
    paths: the fused Pallas GEGLU-FF kernel on TPU (the FF intermediates are
    the UNet's largest HBM consumer — see ops/fused_ffn.py) and the plain
    XLA composition elsewhere / under dropout."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    # which lead dim of x carries FRAMES — 0 in the spatial transformers
    # (frames-in-batch rows), 1 in the temporal ones (frames are the token
    # axis). Consulted only when a sharded serving trace is active
    # (ops/serving_mesh.py) so the fused kernel can run per frame shard.
    frame_dim: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from ..ops.fused_ffn import ffn_eligible, geglu_ffn
        from ..ops.serving_mesh import (
            kernel_specs_for,
            serving_ctx_active,
            shard_map_kernel,
        )

        inner = int(self.dim * self.mult)
        c_in = x.shape[-1]
        w1 = self.param("net_0_proj_kernel", default_kernel_init, (c_in, inner * 2))
        b1 = self.param("net_0_proj_bias", nn.initializers.zeros, (inner * 2,))
        w2 = self.param("net_2_kernel", default_kernel_init, (inner, self.dim))
        b2 = self.param("net_2_bias", nn.initializers.zeros, (self.dim,))
        dt = self.dtype

        lead = x.shape[:-1]
        t = 1
        for s in lead:
            t *= int(s)
        # row-sharded only (never over a tp head axis — the FFN weights
        # stay replicated under tp, parallel/tp.py): head_dim omitted
        km = kernel_specs_for(x.shape, frame_dim=self.frame_dim) \
            if deterministic else None
        n_shards = 1
        if km is not None:
            mesh, spec = km
            for d, ax in spec.items():
                n_shards *= mesh.shape[ax]
        # the kernel each shard runs sees t/n rows — gate on what it sees
        use_fused = deterministic and ffn_eligible(t // n_shards, c_in, inner, dt)
        if use_fused and km is not None:

            def local_ffn(xl, w1l, b1l, w2l, b2l):
                tl = 1
                for s in xl.shape[:-1]:
                    tl *= int(s)
                out = geglu_ffn(xl.reshape(tl, c_in), w1l, b1l, w2l, b2l)
                return out.reshape(*xl.shape[:-1], self.dim)

            # row-local over the sharded dim (weights replicated): per-shard
            # execution is exact, no collectives
            return shard_map_kernel(
                local_ffn, mesh, (spec, None, None, None, None),
            )(x.astype(dt), w1.astype(dt), b1.astype(jnp.float32),
              w2.astype(dt), b2.astype(jnp.float32))
        if use_fused and serving_ctx_active():
            # serving mesh active but rows don't shard: the bare custom
            # call would face GSPMD unwrapped — take the XLA composition
            use_fused = False
        if use_fused:
            out = geglu_ffn(
                x.reshape(t, c_in).astype(dt),
                w1.astype(dt), b1.astype(jnp.float32),
                w2.astype(dt), b2.astype(jnp.float32),
            )
            return out.reshape(*lead, self.dim)

        h = jnp.dot(x.astype(dt), w1.astype(dt)) + b1.astype(dt)
        hx, gate = jnp.split(h, 2, axis=-1)
        h = hx * nn.gelu(gate, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return jnp.dot(h, w2.astype(dt)) + b2.astype(dt)


class BasicTransformerBlock(nn.Module):
    """Self-attn -> cross-attn -> GEGLU FF, pre-LN residual (util.py:510-540)."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    dropout: float = 0.0
    disable_self_attn: bool = False
    # frames' position in x's lead dims (see FeedForward.frame_dim): 0 when
    # hosted by a spatial transformer, 1 when temporal (frames = tokens)
    frame_dim: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        attn_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim if self.disable_self_attn else None,
            heads=self.n_heads,
            dim_head=self.d_head,
            dropout=self.dropout,
            dtype=self.dtype,
            name="attn1",
        )(h, context if self.disable_self_attn else None, deterministic, attn_mask)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim,
            heads=self.n_heads,
            dim_head=self.d_head,
            dropout=self.dropout,
            dtype=self.dtype,
            name="attn2",
        )(h, context, deterministic, attn_mask if context is None else None)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, dropout=self.dropout,
                            frame_dim=self.frame_dim, dtype=self.dtype,
                            name="ff")(h, deterministic)
        return x


class SpatialTransformer(nn.Module):
    """Spatial self+cross attention over the H·W token axis
    (util.py:311-373, use_linear=True).

    Input/output: [BF, H, W, C]."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    dropout: float = 0.0
    disable_self_attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        bf, hh, ww, c = x.shape
        inner = self.n_heads * self.d_head

        # fully-fused Pallas path for the stage-1 hot shapes: the whole
        # block (GN → proj_in → self-attn → cross-attn → GEGLU FF →
        # proj_out) runs VMEM-resident per row (ops/fused_spatial.py). The
        # module composition below remains the init/training/backstop path
        # and owns the (identical) parameter tree.
        if (
            deterministic
            and not self.is_initializing()
            and context is not None
            and self.depth == 1
            and not self.disable_self_attn
            and self.d_head == 64
        ):
            from ..ops.fused_spatial import (
                fused_spatial_transformer,
                spatial_fused_eligible,
            )
            from ..ops.serving_mesh import serving_ctx_active

            # the opt-in whole-block kernel has no shard_map wrapping —
            # sharded serving traces must take the module path (whose
            # attention/FFN kernels DO wrap; ops/serving_mesh.py)
            if (not serving_ctx_active()
                    and spatial_fused_eligible(hh * ww, c, inner, self.n_heads)):
                p = self.variables["params"]
                out = fused_spatial_transformer(
                    x.reshape(bf, hh * ww, c), context, p, self.n_heads
                )
                return out.reshape(bf, hh, ww, c)

        x_in = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = h.reshape(bf, hh * ww, c)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                dim=inner,
                n_heads=self.n_heads,
                d_head=self.d_head,
                context_dim=self.context_dim,
                dropout=self.dropout,
                disable_self_attn=self.disable_self_attn,
                dtype=self.dtype,
                name=f"transformer_blocks_{d}",
            )(h, context, deterministic)
        h = nn.Dense(
            inner,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="proj_out",
        )(h)
        return h.reshape(bf, hh, ww, c) + x_in


class TemporalTransformer(nn.Module):
    """Temporal self-attention over the frame/view axis (util.py:992-1089,
    use_linear=False: conv1d-k1 projections, ``only_self_att=True``).

    Input/output: [B, F, H, W, C]; tokens are the F axis per (b, h, w).
    ``inner_dim = n_heads*d_head`` may differ from C (the dim-320 init block
    uses 8 heads × 64 = 512)."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    dropout: float = 0.0
    multiply_zero: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, f, hh, ww, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        # (b h w) f c token layout
        h = h.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, f, c)
        # conv1d with kernel 1 == dense over channels
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                dim=inner,
                n_heads=self.n_heads,
                d_head=self.d_head,
                context_dim=None,
                dropout=self.dropout,
                frame_dim=1,  # frames are the token axis here
                dtype=self.dtype,
                name=f"transformer_blocks_{d}",
            )(h, None, deterministic)
        h = nn.Dense(
            c, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="proj_out"
        )(h)
        h = h.reshape(b, hh, ww, f, c).transpose(0, 3, 1, 2, 4)
        if self.multiply_zero:
            return x_in
        return x_in + h


def rotary_rotate(x: jnp.ndarray, rot_dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """Rotary position embedding over the sequence axis (axis -2).

    Matches rotary-embedding-torch's ``RotaryEmbedding(dim).rotate_queries_or_keys``
    as used by the reference TemporalAttentionBlock (util.py:937-939,
    unet_t2v.py:164: ``RotaryEmbedding(min(32, head_dim))``): interleaved
    pair rotation of the first ``rot_dim`` channels, remaining channels pass
    through untouched.
    """
    n, d = x.shape[-2], x.shape[-1]
    inv = 1.0 / theta ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim)
    freqs = jnp.arange(n, dtype=jnp.float32)[:, None] * inv[None, :]  # [n, rot/2]
    freqs = jnp.repeat(freqs, 2, axis=-1)  # [n, rot_dim]
    xl = x[..., :rot_dim].astype(jnp.float32)
    xr = x[..., rot_dim:]
    x1, x2 = xl[..., 0::2], xl[..., 1::2]
    rot_half = jnp.stack([-x2, x1], axis=-1).reshape(xl.shape)
    xl = xl * jnp.cos(freqs) + rot_half * jnp.sin(freqs)
    return jnp.concatenate([xl.astype(x.dtype), xr], axis=-1)


class RelativePositionBias(nn.Module):
    """T5-style bucketed relative position bias (util.py:271-309).

    ``__call__(n)`` returns a [heads, n, n] bias added to temporal attention
    logits. Bucketing is computed on static n, so everything folds into
    constants under jit."""

    heads: int = 8
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, n: int) -> jnp.ndarray:
        q_pos = jnp.arange(n)
        rel_pos = q_pos[None, :] - q_pos[:, None]  # k - q
        # _relative_position_bucket (util.py:283-301) with num_buckets=32
        neg = -rel_pos
        half = self.num_buckets // 2
        ret = (neg < 0).astype(jnp.int32) * half
        an = jnp.abs(neg)
        max_exact = half // 2
        val_if_large = max_exact + (
            jnp.log(jnp.maximum(an, 1).astype(jnp.float32) / max_exact)
            / jnp.log(self.max_distance / max_exact)
            * (half - max_exact)
        ).astype(jnp.int32)
        val_if_large = jnp.minimum(val_if_large, half - 1)
        ret = ret + jnp.where(an < max_exact, an, val_if_large)
        table = nn.Embed(
            self.num_buckets, self.heads, name="relative_attention_bias"
        )(ret)  # [n, n, heads]
        return table.transpose(2, 0, 1)


class TemporalAttentionBlock(nn.Module):
    """Rotary temporal attention over the frame axis (util.py:871-990).

    The dormant reference path (``USE_TEMPORAL_TRANSFORMER=False``,
    unet_t2v.py:27,163-175): GroupNorm → fused qkv linear → rotary positions
    on q,k → logits + relative-position bias → optional masks → out linear,
    residual. ``dim_head`` is recomputed as ``dim // heads`` regardless of the
    configured head_dim (util.py:885).

    Masks (all optional, combined exactly as the reference does):
      - ``video_mask [B, F]``: pairwise token validity (joint image/video
        training padding)
      - ``focus_present_mask [B]``: rows attend only to themselves — the
        reference's data-dependent ``.all()`` shortcut (util.py:918-925) is
        numerically identical to the masked general path, so one compiled
        path covers it
      - ``use_sim_mask``: causal lower-triangular (util.py:970-972)

    Input/output: [B, F, H, W, C].
    """

    dim: int
    heads: int = 4
    rotary_dim: int = 32
    use_image_dataset: bool = False
    use_sim_mask: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos_bias: Optional[jnp.ndarray] = None,
        focus_present_mask: Optional[jnp.ndarray] = None,
        video_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, f, hh, ww, c = x.shape
        dim_head = self.dim // self.heads
        scale = dim_head ** -0.5
        identity = x

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        # b (h w) f c token layout (util.py:911)
        h = h.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, f, c)
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="to_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_of(t):  # [bhw, f, dim] -> [bhw, heads, f, dim_head]
            return t.reshape(b * hh * ww, f, self.heads, dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        # reference order: scale q first, then rotate (util.py:934-939)
        q = q * scale
        rot = min(self.rotary_dim, dim_head)
        q = rotary_rotate(q, rot)
        k = rotary_rotate(k, rot)

        sim = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ).astype(jnp.float32)
        if pos_bias is not None:
            sim = sim + pos_bias[None, :, :, :]

        neg = jnp.finfo(jnp.float32).min
        if video_mask is not None and focus_present_mask is None:
            m = (video_mask[:, None, :] & video_mask[:, :, None])  # [B, f, f]
            m = jnp.repeat(m, hh * ww, axis=0)[:, None, :, :]
            sim = jnp.where(m, sim, neg)
        elif focus_present_mask is not None:
            eye = jnp.eye(f, dtype=bool)
            allm = jnp.ones((f, f), dtype=bool)
            m = jnp.where(focus_present_mask[:, None, None], eye[None], allm[None])
            m = jnp.repeat(m, hh * ww, axis=0)[:, None, :, :]
            sim = jnp.where(m, sim, neg)
        if self.use_sim_mask:
            tril = jnp.tril(jnp.ones((f, f), dtype=bool))
            sim = jnp.where(tril[None, None], sim, neg)

        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b * hh * ww, f, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = out.reshape(b, hh, ww, f, c).transpose(0, 3, 1, 2, 4)

        if self.use_image_dataset:
            return identity
        return identity + out


class TemporalAttentionMultiBlock(nn.Module):
    """Stack of ``temporal_attn_times`` TemporalAttentionBlocks
    (util.py:1249-1277) — this is where the reference actually honors
    ``temporal_attn_times`` (the TemporalTransformer path ignores it, which
    the transformer-path UNet here mirrors)."""

    dim: int
    heads: int = 4
    rotary_dim: int = 32
    temporal_attn_times: int = 1
    use_image_dataset: bool = False
    use_sim_mask: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos_bias: Optional[jnp.ndarray] = None,
        focus_present_mask: Optional[jnp.ndarray] = None,
        video_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        for i in range(self.temporal_attn_times):
            x = TemporalAttentionBlock(
                dim=self.dim,
                heads=self.heads,
                rotary_dim=self.rotary_dim,
                use_image_dataset=self.use_image_dataset,
                use_sim_mask=self.use_sim_mask,
                dtype=self.dtype,
                name=f"att_layers_{i}",
            )(x, pos_bias, focus_present_mask, video_mask, deterministic)
        return x


class TemporalTransformerAttemask(nn.Module):
    """Causal temporal transformer (util.py:1150-1247): the
    TemporalTransformer layout with every attention lower-triangular-masked
    (MemoryEfficientCrossAttention_attemask, util.py:430-474, applies
    ``LowerTriangularMask`` to both attn1 and attn2 of the block).

    Input/output: [B, F, H, W, C]."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    dropout: float = 0.0
    multiply_zero: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, f, hh, ww, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = h.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, f, c)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        causal = jnp.tril(jnp.ones((f, f), dtype=bool))[None, None]
        for d in range(self.depth):
            h = BasicTransformerBlock(
                dim=inner,
                n_heads=self.n_heads,
                d_head=self.d_head,
                context_dim=None,
                dropout=self.dropout,
                frame_dim=1,  # frames are the token axis here
                dtype=self.dtype,
                name=f"transformer_blocks_{d}",
            )(h, None, deterministic, attn_mask=causal)
        h = nn.Dense(
            c, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="proj_out"
        )(h)
        h = h.reshape(b, hh, ww, f, c).transpose(0, 3, 1, 2, 4)
        if self.multiply_zero:
            return x_in
        return x_in + h


class DropPath(nn.Module):
    """Per-sample stochastic path drop WITHOUT rescaling (util.py:1395-1433).

    The reference draws a Binomial(b, p)-sized random subset of rows to zero;
    per-sample that is Bernoulli(p), which is what we sample here (i.i.d.,
    the idiomatic jax.random form). ``zero``/``keep`` boolean overrides force
    rows to always/never drop, as in the reference."""

    p: float

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        zero: Optional[jnp.ndarray] = None,
        keep: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if deterministic or self.p == 0.0:
            return x
        rng = self.make_rng("dropout")
        b = x.shape[0]
        drop = jax.random.bernoulli(rng, self.p, (b,))
        if keep is not None:
            drop = jnp.where(keep, False, drop)
        if zero is not None:
            drop = jnp.where(zero, True, drop)
        mult = jnp.where(drop, 0.0, 1.0).astype(x.dtype)
        return x * mult.reshape((b,) + (1,) * (x.ndim - 1))


class TemporalConvBlockV2(nn.Module):
    """Four stacked (3,1,1) temporal convs with zero-init tail, residual
    (util.py:1347-1392). Input/output: [B, F, H, W, C]."""

    in_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    multiply_zero: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_dim = self.out_dim or self.in_dim
        identity = x

        def tconv(h, features, name, zero=False, drop=True):
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name=f"{name}_0")(h)
            h = nn.silu(h)
            if drop:
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            idx = 3 if drop else 2
            init = (
                dict(kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
                if zero
                else {}
            )
            h = nn.Conv(
                features,
                kernel_size=(3, 1, 1),
                padding=((1, 1), (0, 0), (0, 0)),
                dtype=self.dtype,
                name=f"{name}_{idx}",
                **init,
            )(h)
            return h

        h = tconv(x, out_dim, "conv1", drop=False)
        h = tconv(h, self.in_dim, "conv2")
        h = tconv(h, self.in_dim, "conv3")
        h = tconv(h, self.in_dim, "conv4", zero=True)

        if self.multiply_zero:
            return identity
        return identity + h


class ResBlock(nn.Module):
    """GN/SiLU/conv residual block + timestep-emb add + fused temporal conv
    (util.py:610-730, use_scale_shift_norm=False as configured).

    ``__call__(x[BF,H,W,C], emb[BF,E], frames)``."""

    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: Optional[int] = None
    use_temporal_conv: bool = True
    use_image_dataset: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        emb: jnp.ndarray,
        frames: int,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        out_ch = self.out_channels or self.channels

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="in_layers_0")(x)
        h = nn.silu(h)
        h = nn.Conv(out_ch, kernel_size=(3, 3), padding=1, dtype=self.dtype, name="in_layers_2")(h)

        e = nn.silu(emb)
        e = nn.Dense(out_ch, dtype=self.dtype, name="emb_layers_1")(e)
        h = h + e[:, None, None, :].astype(h.dtype)

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="out_layers_0")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            out_ch,
            kernel_size=(3, 3),
            padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="out_layers_3",
        )(h)

        if out_ch == self.channels:
            skip = x
        else:
            skip = nn.Conv(out_ch, kernel_size=(1, 1), dtype=self.dtype, name="skip_connection")(x)
        h = skip + h

        if self.use_temporal_conv:
            bf, hh, ww, c = h.shape
            b = bf // frames
            ht = h.reshape(b, frames, hh, ww, c)
            ht = TemporalConvBlockV2(
                in_dim=out_ch,
                out_dim=out_ch,
                dropout=0.1,
                multiply_zero=self.use_image_dataset,
                dtype=self.dtype,
                name="temopral_conv",  # [sic] — matches reference key (util.py:691)
            )(ht, deterministic)
            h = ht.reshape(bf, hh, ww, c)
        return h


class Upsample(nn.Module):
    """Nearest ×2 upsample + 3×3 conv (util.py:579-607). [BF,H,W,C]."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bf, h, w, c = x.shape
        x = jax.image.resize(x, (bf, h * 2, w * 2, c), method="nearest")
        x = nn.Conv(self.channels, kernel_size=(3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3×3 conv (util.py:732-756). [BF,H,W,C]."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=1,
            dtype=self.dtype,
            name="op",
        )(x)
