"""Stable-Diffusion KL-VAE first stage in Flax (NHWC).

Capability parity with the reference ``AutoencoderKL``
(/root/reference/tools/modules/autoencoder.py:31-160): frozen SD VAE with
ch=128, ch_mult [1,2,4,4], 2 res blocks, mid attention, z=4 channels,
8× spatial downsample, scale_factor 0.18215.  Encode/decode are pure
functions of the params pytree so they can live inside the jitted sampling
scan (the GS-refine path decodes/encodes latents *inside* the DDIM loop).

Param naming mirrors the torch checkpoint keys after dots→underscores
(``encoder.down.0.block.1.norm1`` ↔ ``encoder/down_0_block_1/norm1``); the
reference's typo'd public API ``encode_firsr_stage`` (autoencoder.py:86) is
kept as an alias for drop-in compatibility.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _gn(name: str, dtype) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype, name=name)


def swish(x):
    return x * jax.nn.sigmoid(x)


class VAEResnetBlock(nn.Module):
    in_channels: int
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.out_channels or self.in_channels
        h = _gn("norm1", self.dtype)(x)
        h = swish(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = _gn("norm2", self.dtype)(h)
        h = swish(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if out_ch != self.in_channels:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head self-attention over H·W (autoencoder.py AttnBlock)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        h = _gn("norm", self.dtype)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h).reshape(b, hh * ww, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h).reshape(b, hh * ww, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h).reshape(b, hh * ww, c)
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits.astype(jnp.float32) * (c ** -0.5), axis=-1)
        h = jnp.einsum("bqk,bkc->bqc", attn.astype(v.dtype), v).reshape(b, hh, ww, c)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        in_ch_mult = (1,) + tuple(self.ch_mult)
        for i, mult in enumerate(self.ch_mult):
            block_in = self.ch * in_ch_mult[i]
            block_out = self.ch * mult
            for j in range(self.num_res_blocks):
                h = VAEResnetBlock(
                    block_in if j == 0 else block_out,
                    block_out,
                    dtype=self.dtype,
                    name=f"down_{i}_block_{j}",
                )(h)
            if i != len(self.ch_mult) - 1:
                # SD downsample: asymmetric (0,1) pad then stride-2 valid conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    block_out, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"down_{i}_downsample_conv",
                )(h)
        block_in = self.ch * self.ch_mult[-1]
        h = VAEResnetBlock(block_in, block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(block_in, dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(block_in, block_in, dtype=self.dtype, name="mid_block_2")(h)
        h = _gn("norm_out", self.dtype)(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return h


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = VAEResnetBlock(block_in, block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(block_in, dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(block_in, block_in, dtype=self.dtype, name="mid_block_2")(h)

        for i in reversed(range(len(self.ch_mult))):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(
                    block_in if j == 0 else block_out,
                    block_out,
                    dtype=self.dtype,
                    name=f"up_{i}_block_{j}",
                )(h)
            block_in = block_out
            if i != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(
                    block_out, (3, 3), padding=1, dtype=self.dtype,
                    name=f"up_{i}_upsample_conv",
                )(h)

        h = _gn("norm_out", self.dtype)(h)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return h


class AutoencoderKL(nn.Module):
    """SD KL-VAE: encode to a diagonal Gaussian, decode latents to RGB.

    Public API (layout [B, C, H, W] to match reference callers; internally
    NHWC):
      - ``encode_moments(x) -> (mean, logvar)``
      - ``encode_first_stage(x, scale_factor, rng=None)`` (+ the reference's
        typo'd alias ``encode_firsr_stage``); with no rng, returns the mode
      - ``decode(z)``
    """

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    out_ch: int = 3
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            z_channels=self.z_channels, dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            out_ch=self.out_ch, dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x: jnp.ndarray):
        h = x.transpose(0, 2, 3, 1).astype(self.dtype)  # NCHW -> NHWC
        h = self.encoder(h)
        moments = self.quant_conv(h)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean.transpose(0, 3, 1, 2), logvar.transpose(0, 3, 1, 2)

    def encode_first_stage(
        self, x: jnp.ndarray, scale_factor: float = 1.0, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        mean, logvar = self.encode_moments(x)
        if rng is not None:
            std = jnp.exp(0.5 * logvar)
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return scale_factor * mean

    # reference public API typo (autoencoder.py:86) kept for compatibility
    encode_firsr_stage = encode_first_stage

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        h = z.transpose(0, 2, 3, 1).astype(self.dtype)
        h = self.post_quant_conv(h)
        h = self.decoder(h)
        return h.transpose(0, 3, 1, 2).astype(jnp.float32)

    def __call__(self, x: jnp.ndarray, rng: Optional[jax.Array] = None):
        """Full round-trip (used for init)."""
        z = self.encode_first_stage(x, 1.0, rng)
        return self.decode(z)
