"""The image→multiview 3D video UNet (UNetSD_I2VGen parity).

Same backbone as ``UNetSD_T2VBase`` plus the I2VGen-XL image-conditioning
adapters (/root/reference/tools/modules/unet/unet_i2vgen.py:27-541):

  1. concat plane: the reference frame's VAE latent runs through a conv
     stack + a tiny temporal transformer after being tiled with a temporal
     position ramp ((tpos+1)/(f-1) for frames 1..f-1); the result is ADDED
     TWICE into the concat plane — the reference's acknowledged bug
     (unet_i2vgen.py:345-346) which the released weights were trained with,
     so we reproduce its effect (doubling) intentionally.
  2. local context: the same latent pooled to 64 tokens of width 1024
     (``local_image_embedding``, :371-375) appended to the text tokens.
  3. global context: the CLIP image embedding expanded into
     ``num_tokens=4`` context tokens (``context_embedding``, :377-381).
  4. fps embedding is always applied (zero-init), camera embedding as in
     T2V.

Context length = 77 (text) + 64 (local) + 4 (global) = 145 tokens.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import TimestepMLP, sinusoidal_embedding
from .unet_t2v import UNetSD_T2VBase, build_unet_plan

Dtype = Any


class PreNormAttention(nn.Module):
    """LayerNorm → single-head-family attention with packed qkv, residual
    (reference util.py:1091-1127 Attention + PreNormattention)."""

    dim: int
    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="fn_to_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s, _ = q.shape
        q = q.reshape(b, s, self.heads, self.dim_head)
        k = k.reshape(b, s, self.heads, self.dim_head)
        v = v.reshape(b, s, self.heads, self.dim_head)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32) * (self.dim_head ** -0.5), axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v).reshape(b, s, inner)
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        if project_out:
            o = nn.Dense(self.dim, dtype=self.dtype, name="fn_to_out_0")(o)
        return x + o


class TransformerV2(nn.Module):
    """The adapter transformer (reference util.py:1129-1148): PreNorm
    attention + plain-GELU feedforward per layer."""

    dim: int
    heads: int = 2
    dim_head: int = 4
    mlp_dim: int = 4
    depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.depth):
            x = PreNormAttention(
                self.dim, self.heads, self.dim_head, dtype=self.dtype,
                name=f"layers_{i}_0",
            )(x)
            # FeedForward(dim, mlp_dim, glu=False): Linear->GELU->Linear, +res
            h = nn.Dense(int(self.dim * 4), dtype=self.dtype, name=f"layers_{i}_1_net_0_0")(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"layers_{i}_1_net_2")(h)
            x = x + h
        return x


def adaptive_avg_pool_2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d over NHWC (exact when sizes divide)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h == oh and w == ow:
        return x
    if h % oh == 0 and w % ow == 0:
        return x.reshape(b, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))
    return jax.image.resize(x, (b, oh, ow, c), method="linear")


class UNetSD_I2VGen(UNetSD_T2VBase):
    """I2V denoiser: T2V backbone + image conditioning adapters.

    Extra inputs: ``local_image`` [B, 4, 1, h, w] (VAE latent of the
    reference frame) and ``image`` [B, y_dim] (CLIP global image emb).
    ``concat_dim`` equals ``in_dim`` (reference unet_i2vgen.py:93)."""

    num_tokens: int = 4

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        fps: Optional[jnp.ndarray] = None,
        camera_data: Optional[jnp.ndarray] = None,
        local_image: Optional[jnp.ndarray] = None,
        image: Optional[jnp.ndarray] = None,
        zero_y: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, c, f, hh, ww = x.shape
        embed_dim = self.dim * 4
        concat_dim = self.in_dim

        assert local_image is not None, "I2V requires the reference-frame latent"
        if local_image.ndim == 5 and local_image.shape[2] > 1:
            local_image = local_image[:, :, :1]
        elif local_image.ndim == 4:
            local_image = local_image[:, :, None]

        # ---- concat plane (unet_i2vgen.py:331-346)
        if f > 1:
            ramp = (jnp.arange(1, f, dtype=x.dtype) / (f - 1)).reshape(1, 1, f - 1, 1, 1)
            mask_pos = jnp.broadcast_to(
                ramp, (b, c, f - 1, hh, ww)
            )
            ximg = jnp.concatenate([local_image[:, :, :1], mask_pos], axis=2)
        else:
            ximg = local_image
        # per-frame conv stack: NHWC
        xi = ximg.transpose(0, 2, 3, 4, 1).reshape(b * f, hh, ww, c).astype(self.dtype)
        xi = nn.Conv(concat_dim * 4, (3, 3), padding=1, dtype=self.dtype,
                     name="local_image_concat_0")(xi)
        xi = nn.silu(xi)
        xi = nn.Conv(concat_dim * 4, (3, 3), padding=1, dtype=self.dtype,
                     name="local_image_concat_2")(xi)
        xi = nn.silu(xi)
        xi = nn.Conv(concat_dim, (3, 3), padding=1, dtype=self.dtype,
                     name="local_image_concat_4")(xi)
        # tiny temporal transformer over frames per pixel
        xi = xi.reshape(b, f, hh, ww, concat_dim).transpose(0, 2, 3, 1, 4)
        xi = xi.reshape(b * hh * ww, f, concat_dim)
        xi = TransformerV2(
            dim=concat_dim, heads=2, dim_head=concat_dim, mlp_dim=concat_dim,
            depth=1, dtype=self.dtype, name="local_temporal_encoder",
        )(xi)
        xi = xi.reshape(b, hh, ww, f, concat_dim).transpose(0, 3, 1, 2, 4)
        # reference adds the plane twice (acknowledged bug, kept for weight
        # compatibility: unet_i2vgen.py:345-346)
        concat = 2.0 * xi  # [B, F, H, W, concat_dim]

        # ---- embeddings (fps always on, unet_i2vgen.py:349)
        e = TimestepMLP(embed_dim, dtype=self.dtype, name="time_embed")(
            sinusoidal_embedding(t, self.dim)
        )
        if fps is None:
            fps = jnp.full_like(t, 8)
        e = e + TimestepMLP(embed_dim, zero_init=True, dtype=self.dtype, name="fps_embedding")(
            sinusoidal_embedding(fps, self.dim)
        )
        e = jnp.repeat(e, f, axis=0)
        if self.use_camera_condition and camera_data is not None:
            cam = camera_data.reshape(b * f, self.camera_dim).astype(self.dtype)
            e = e + TimestepMLP(
                embed_dim, zero_init=True, dtype=self.dtype, name="camera_embedding"
            )(cam)
        e = e.astype(self.dtype)

        # ---- context: text + 64 local tokens + 4 global tokens
        if y is None:
            assert zero_y is not None
            y = jnp.broadcast_to(zero_y[:, :1, :], (b, 1, self.context_dim))
        context = y.astype(self.dtype)

        lc = local_image[:, :, 0].transpose(0, 2, 3, 1).astype(self.dtype)  # [B,h,w,4]
        lc = nn.Conv(concat_dim * 8, (3, 3), padding=1, dtype=self.dtype,
                     name="local_image_embedding_0")(lc)
        lc = nn.silu(lc)
        lc = adaptive_avg_pool_2d(lc, (32, 32))
        lc = nn.Conv(concat_dim * 16, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="local_image_embedding_3")(lc)
        lc = nn.silu(lc)
        # the reference hardcodes 1024 here (unet_i2vgen.py:162); identical to
        # context_dim in every shipped config, parameterized for tiny models
        lc = nn.Conv(self.context_dim, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="local_image_embedding_5")(lc)
        lc = lc.reshape(b, -1, self.context_dim)  # 64 tokens
        context = jnp.concatenate([context, lc], axis=1)

        if image is not None:
            # context_embedding: Linear(y_dim->embed) SiLU Linear(embed->ctx*num_tokens)
            img = nn.Dense(embed_dim, dtype=self.dtype, name="context_embedding_0")(
                image.astype(self.dtype)
            )
            img = nn.silu(img)
            img = nn.Dense(
                self.context_dim * self.num_tokens, dtype=self.dtype,
                name="context_embedding_2",
            )(img)
            img = img.reshape(b, self.num_tokens, self.context_dim)
            context = jnp.concatenate([context, img], axis=1)

        context = jnp.repeat(context, f, axis=0)

        # ---- backbone with widened init conv (in_dim + concat_dim channels)
        h = x.transpose(0, 2, 3, 4, 1).astype(self.dtype)  # [B,F,H,W,C]
        h = jnp.concatenate([h, concat], axis=-1)
        h = h.reshape(b * f, hh, ww, c + concat_dim)

        enc_entries, dec_entries = build_unet_plan(
            self.dim, self.dim_mult, self.num_res_blocks, self.attn_scales,
            self.temporal_attention,
        )

        def run_entry(h, entry):
            for kind, name, cin, cout in entry:
                mod = self._block(kind, name, cin, cout)
                if kind in ("conv_in", "down", "up"):
                    h = mod(h)
                elif kind == "res":
                    h = mod(h, e, f, deterministic)
                elif kind == "spatial":
                    h = mod(h, context, deterministic)
                elif kind == "temporal":
                    bf, hh_, ww_, c_ = h.shape
                    ht = h.reshape(b, f, hh_, ww_, c_)
                    ht = mod(ht, deterministic)
                    h = ht.reshape(bf, hh_, ww_, c_)
            return h

        xs = []
        for entry in enc_entries:
            h = run_entry(h, entry)
            xs.append(h)

        mid_ch = self.dim * self.dim_mult[-1]
        h = run_entry(h, [
            ("res", "middle_block_0", mid_ch, mid_ch),
            ("spatial", "middle_block_1", mid_ch, mid_ch),
            ("temporal", "middle_block_2", mid_ch, mid_ch),
            ("res", "middle_block_3", mid_ch, mid_ch),
        ])

        for entry in dec_entries:
            h = jnp.concatenate([h, xs.pop()], axis=-1)
            h = run_entry(h, entry)

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="out_0")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_dim, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="out_2")(h)
        return h.reshape(b, f, hh, ww, self.out_dim).transpose(0, 4, 1, 2, 3).astype(jnp.float32)
