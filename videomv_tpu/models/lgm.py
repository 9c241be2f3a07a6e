"""LGM — feed-forward Gaussian-splat reconstructor, in Flax (NHWC).

Capability parity with the reference ``core/models.py`` + ``core/unet.py``:
an asymmetric UNet takes V=4 views of 9-channel input (3 RGB + 6 Plücker
rays) at 256², runs cross-view ``MVAttention`` at the deep stages, and emits
14-channel Gaussian parameter maps at splat resolution (128² for 'big'),
activated per-channel into (pos, opacity, scale, rotation, rgb) Gaussians:

  pos      clamp(-1, 1)                (core/models.py:39)
  opacity  sigmoid                     (:41)
  scale    0.1 * softplus              (:40)
  rotation L2-normalized quaternion    (:42)
  rgb      0.5*tanh + 0.5              (:43)

Param naming mirrors the torch module tree (``unet.down_blocks.0.nets.0``
↔ ``unet/down_blocks_0_nets_0``) so the released ``model.safetensors``
and the ``lgm_big.*`` subtree of UNet checkpoints convert mechanically.

Rendering runs through ``videomv_tpu.ops.gaussian_splat`` (differentiable
tile-based rasterizer — the TPU replacement for the reference's CUDA
``diff-gaussian-rasterization`` submodule).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import dot_product_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LGMOptions:
    """Geometry/architecture options (reference core/options.py; defaults =
    the 'big' variant used by VideoMV, options.py:92-103)."""

    input_size: int = 256
    down_channels: Tuple[int, ...] = (64, 128, 256, 512, 1024, 1024)
    down_attention: Tuple[bool, ...] = (False, False, False, True, True, True)
    mid_attention: bool = True
    up_channels: Tuple[int, ...] = (1024, 1024, 512, 256, 128)
    up_attention: Tuple[bool, ...] = (True, True, True, False, False)
    splat_size: int = 128
    output_size: int = 512
    fovy: float = 39.6
    znear: float = 0.5
    zfar: float = 2.5
    num_views: int = 8
    num_input_views: int = 4
    cam_radius: float = 1.5
    lambda_lpips: float = 1.0

    @classmethod
    def big(cls) -> "LGMOptions":
        return cls()

    @classmethod
    def small(cls) -> "LGMOptions":
        return cls(
            down_channels=(64, 128, 256, 512, 1024, 1024),
            up_channels=(1024, 1024, 512, 256),
            up_attention=(True, True, True, False),
            splat_size=64,
            output_size=256,
        )

    @classmethod
    def tiny(cls) -> "LGMOptions":
        return cls(
            down_channels=(32, 64, 128, 256),
            down_attention=(False, False, False, True),
            up_channels=(256, 128, 64),
            up_attention=(True, False, False),
            splat_size=128,
            output_size=256,
        )


class MVAttention(nn.Module):
    """Cross-view attention: flattens V·H·W into one token axis so every view
    attends to every other (reference core/unet.py:11-49)."""

    dim: int
    # reference blocks pass attention_heads=16 (core/unet.py:116,155,196 —
    # the MVAttention ctor default of 8 is never used by the UNet)
    num_heads: int = 16
    num_frames: int = 4
    skip_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B*V, H, W, C]
        bv, hh, ww, c = x.shape
        b = bv // self.num_frames
        res = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        h = h.reshape(b, self.num_frames * hh * ww, c)

        qkv = nn.Dense(c * 3, use_bias=False, dtype=self.dtype, name="attn_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.num_heads
        s = h.shape[1]
        q = q.reshape(b, s, self.num_heads, hd)
        k = k.reshape(b, s, self.num_heads, hd)
        v = v.reshape(b, s, self.num_heads, hd)
        o = dot_product_attention(q, k, v).reshape(b, s, c)
        o = nn.Dense(c, dtype=self.dtype, name="attn_proj")(o)
        o = o.reshape(bv, hh, ww, c)
        return (o + res) * self.skip_scale


class LGMResnetBlock(nn.Module):
    """GN→SiLU→conv ×2 with optional up/down resample (core/unet.py:51-103)."""

    in_channels: int
    out_channels: int
    resample: str = "default"  # default | up | down
    skip_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        if self.resample == "up":
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
            res = jax.image.resize(res, (b, hh * 2, ww * 2, res.shape[-1]), method="nearest")
        elif self.resample == "down":
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            res = nn.avg_pool(res, (2, 2), strides=(2, 2))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if self.in_channels != self.out_channels:
            res = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(res)
        return (h + res) * self.skip_scale


class LGMUNet(nn.Module):
    """Asymmetric encoder-decoder with cross-view attention
    (core/unet.py:234-319). Input [B*V, H, W, Cin] → [B*V, H', W', Cout]."""

    in_channels: int = 9
    out_channels: int = 14
    down_channels: Tuple[int, ...] = (64, 128, 256, 512, 1024, 1024)
    down_attention: Tuple[bool, ...] = (False, False, False, True, True, True)
    mid_attention: bool = True
    up_channels: Tuple[int, ...] = (1024, 1024, 512, 256, 128)
    up_attention: Tuple[bool, ...] = (True, True, True, False, False)
    layers_per_block: int = 2
    skip_scale: float = float(np.sqrt(0.5))
    num_frames: int = 4
    dtype: Dtype = jnp.float32
    # Rematerialize each block in the backward pass. The 512²-render refine
    # finetune (reference output_size=512, core/options.py:92-103) doesn't
    # fit the v5e's 16 GB with all ~60 intra-block activations of the
    # 256²-input encoder stored; per-block remat keeps only the skip list
    # (needed anyway) at ~30 % extra LGM forward FLOPs.
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ResBlock, Attn = LGMResnetBlock, MVAttention
        if self.use_checkpoint:
            ResBlock = nn.remat(LGMResnetBlock)
            Attn = nn.remat(MVAttention)
        x = nn.Conv(self.down_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)

        xss = [x]
        cout = self.down_channels[0]
        for i, ch in enumerate(self.down_channels):
            cin = cout
            cout = ch
            for j in range(self.layers_per_block):
                x = ResBlock(
                    cin if j == 0 else cout, cout, skip_scale=self.skip_scale,
                    dtype=self.dtype, name=f"down_blocks_{i}_nets_{j}",
                )(x)
                if self.down_attention[i]:
                    x = Attn(
                        cout, num_frames=self.num_frames, skip_scale=self.skip_scale,
                        dtype=self.dtype, name=f"down_blocks_{i}_attns_{j}",
                    )(x)
                xss.append(x)
            if i != len(self.down_channels) - 1:
                x = nn.Conv(
                    cout, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name=f"down_blocks_{i}_downsample",
                )(x)
                xss.append(x)

        # mid (core/unet.py:150-181): res, then [attn, res] per layer
        mid_ch = self.down_channels[-1]
        x = ResBlock(mid_ch, mid_ch, skip_scale=self.skip_scale,
                           dtype=self.dtype, name="mid_block_nets_0")(x)
        if self.mid_attention:
            x = Attn(mid_ch, num_frames=self.num_frames,
                            skip_scale=self.skip_scale, dtype=self.dtype,
                            name="mid_block_attns_0")(x)
        x = ResBlock(mid_ch, mid_ch, skip_scale=self.skip_scale,
                           dtype=self.dtype, name="mid_block_nets_1")(x)

        # up (asymmetric skip selection, core/unet.py:272-286, 308-312)
        cout = self.up_channels[0]
        for i, ch in enumerate(self.up_channels):
            cin = cout
            cout = ch
            cskip = self.down_channels[max(-2 - i, -len(self.down_channels))]
            n_layers = self.layers_per_block + 1
            xs = xss[-n_layers:]
            xss = xss[:-n_layers]
            for j in range(n_layers):
                c_in_layer = cin if j == 0 else cout
                res_x = xs[-1]
                xs = xs[:-1]
                x = jnp.concatenate([x, res_x], axis=-1)
                x = ResBlock(
                    c_in_layer + res_x.shape[-1], cout, skip_scale=self.skip_scale,
                    dtype=self.dtype, name=f"up_blocks_{i}_nets_{j}",
                )(x)
                if self.up_attention[i]:
                    x = Attn(
                        cout, num_frames=self.num_frames, skip_scale=self.skip_scale,
                        dtype=self.dtype, name=f"up_blocks_{i}_attns_{j}",
                    )(x)
            if i != len(self.up_channels) - 1:
                b, hh, ww, c = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, c), method="nearest")
                x = nn.Conv(cout, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_blocks_{i}_upsample")(x)

        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class LGM(nn.Module):
    """Views+rays → per-pixel Gaussian parameters (reference core/models.py:14-116).

    ``forward_gaussians(images [B, V, 9, H, W]) -> [B, V·S·S, 14]`` with the
    channel layout (pos 3, opacity 1, scale 3, rotation 4, rgb 3). Rendering
    and losses are composed externally (ops.gaussian_splat + training loop)
    to keep this module a pure tensor function.
    """

    opt: LGMOptions = LGMOptions.big()
    dtype: Dtype = jnp.float32
    use_checkpoint: bool = False  # per-block remat (512² refine finetune)

    def setup(self):
        self.unet = LGMUNet(
            in_channels=9,
            out_channels=14,
            down_channels=self.opt.down_channels,
            down_attention=self.opt.down_attention,
            mid_attention=self.opt.mid_attention,
            up_channels=self.opt.up_channels,
            up_attention=self.opt.up_attention,
            num_frames=self.opt.num_input_views,
            dtype=self.dtype,
            use_checkpoint=self.use_checkpoint,
        )
        self.conv = nn.Conv(14, (1, 1), dtype=self.dtype)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.forward_gaussians(images)

    def forward_gaussians(self, images: jnp.ndarray) -> jnp.ndarray:
        B, V, C, H, W = images.shape
        x = images.reshape(B * V, C, H, W).transpose(0, 2, 3, 1).astype(self.dtype)
        x = self.unet(x)
        x = self.conv(x)  # [B*V, S, S, 14]
        S = self.opt.splat_size
        x = x.reshape(B, V * S * S, 14).astype(jnp.float32)

        pos = jnp.clip(x[..., 0:3], -1, 1)
        opacity = jax.nn.sigmoid(x[..., 3:4])
        scale = 0.1 * jax.nn.softplus(x[..., 4:7])
        rotation = x[..., 7:11]
        # reference quirk, reproduced exactly (core/models.py:42): rot_act is
        # bare F.normalize, whose DEFAULT dim=1 normalizes each quaternion
        # component across ALL N Gaussians (upstream LGM used dim=-1; VideoMV
        # dropped the lambda). The rasterizer consumes the result raw (no
        # per-quat renormalize, matching the CUDA computeCov3D), so the
        # near-zero quats → ~identity rotations behavior is baked into the
        # released weights and must be matched for PSNR parity.
        rotation = rotation / jnp.clip(
            jnp.linalg.norm(rotation, axis=1, keepdims=True), 1e-12, None
        )
        rgb = 0.5 * jnp.tanh(x[..., 11:14]) + 0.5
        return jnp.concatenate([pos, opacity, scale, rotation, rgb], axis=-1)
