"""Frozen OpenCLIP ViT-H-14 text + visual towers in Flax.

Parity target: ``FrozenOpenCLIPTtxtVisualEmbedder``
(/root/reference/tools/modules/clip_embedder.py:144-227): returns
``(image_emb, pooled_text_emb, token_sequence)`` where the token sequence is
taken after the *penultimate* transformer block followed by ``ln_final``
(clip_embedder.py:191-199) — that sequence is the UNet's cross-attention
context (y_words, [B, 77, 1024]).

ViT-H-14 geometry: text width 1024 / 24 layers / 16 heads, visual width 1280
/ 32 layers / 16 heads, patch 14 @ 224², final projection to 1024.
Weights load from the released ``open_clip_pytorch_model.bin`` via
``videomv_tpu.training.checkpoints.convert_open_clip``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class CLIPAttention(nn.Module):
    """torch.nn.MultiheadAttention equivalent (packed-qkv checkpoint layout is
    split into q/k/v by the converter)."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, s, c = x.shape
        hd = self.width // self.heads
        q = nn.Dense(self.width, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.width, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.width, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, s, self.heads, hd)
        k = k.reshape(b, s, self.heads, hd)
        v = v.reshape(b, s, self.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits.astype(jnp.float32) * (hd ** -0.5)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class CLIPResBlock(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        x = x + CLIPAttention(self.width, self.heads, dtype=self.dtype, name="attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_c_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


class CLIPTextTower(nn.Module):
    """Causal text transformer; ``skip_last`` reproduces the 'penultimate'
    layer selection of the reference (clip_embedder.py:215-223)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 1024
    heads: int = 16
    layers: int = 24
    embed_dim: int = 1024
    skip_last: int = 1  # 'penultimate'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tokens: int32 [B, 77]. Returns (pooled [B, embed_dim],
        sequence [B, 77, width])."""
        emb = nn.Embed(self.vocab_size, self.width, dtype=self.dtype, name="token_embedding")
        x = emb(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[None].astype(x.dtype)

        s = self.context_length
        causal = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)
        for i in range(self.layers - self.skip_last):
            x = CLIPResBlock(
                self.width, self.heads, dtype=self.dtype,
                name=f"transformer_resblocks_{i}",
            )(x, causal)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
        )
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        pooled = pooled @ proj.astype(pooled.dtype)
        return pooled, x


class CLIPVisionTower(nn.Module):
    """ViT-H/14 visual tower → pooled, projected image embedding [B, 1024]."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    heads: int = 16
    layers: int = 32
    embed_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: [B, 3, H, W] (CLIP-normalized). Returns [B, embed_dim]."""
        x = images.transpose(0, 2, 3, 1).astype(self.dtype)
        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        cls = self.param("class_embedding", nn.initializers.normal(0.01), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c)).astype(x.dtype), x], axis=1)
        n_tok = (self.image_size // self.patch_size) ** 2 + 1
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (n_tok, self.width)
        )
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.layers):
            x = CLIPResBlock(
                self.width, self.heads, dtype=self.dtype,
                name=f"transformer_resblocks_{i}",
            )(x, None)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(self.width ** -0.5), (self.width, self.embed_dim)
        )
        return x @ proj.astype(x.dtype)


class OpenCLIPTextVisual(nn.Module):
    """Joint tower matching FrozenOpenCLIPTtxtVisualEmbedder's contract:
    ``(tokens, images) -> (image_emb | None, pooled_text, token_seq)``."""

    dtype: Dtype = jnp.float32

    def setup(self):
        self.text = CLIPTextTower(dtype=self.dtype)
        self.visual = CLIPVisionTower(dtype=self.dtype)

    def __call__(self, tokens: jnp.ndarray, images: Optional[jnp.ndarray] = None):
        pooled, seq = self.text(tokens)
        img = self.visual(images) if images is not None else None
        return img, pooled, seq

    def encode_text(self, tokens: jnp.ndarray):
        return self.text(tokens)

    def encode_image(self, images: jnp.ndarray):
        return self.visual(images)


# CLIP normalization constants (reference tools/modules/config.py:77-78)
VIT_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
VIT_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)
