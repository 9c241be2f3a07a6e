"""The 3D video UNet for text→multiview generation (UNetSD_T2VBase).

Capability-parity re-design of the reference denoiser
(/root/reference/tools/modules/unet/unet_t2v.py:56-523) as a single Flax
module compiled once by XLA:

  - spatial layout NHWC, frames flattened into batch: [B·F, H, W, C]
  - temporal transformers see [B, F, H, W, C] and attend over the F=24 views
  - time/camera/fps embeddings per reference: sinusoidal t-emb through a
    2-layer MLP, repeated per frame, plus the zero-init camera-pose MLP on
    the flattened 4×4 c2w matrix (unet_t2v.py:322-335)
  - the `isinstance`-dispatched ModuleList walk of the reference is replaced
    by a statically-unrolled block plan (everything is traced once)

The 3D-aware LGM-refine path of the reference forward
(unet_t2v.py:370-433) lives outside this module — see
``videomv_tpu.inference.refine`` — so the denoiser remains a pure tensor
function suitable for lax.scan sampling and gradient checkpointing.

Architecture for the shipped config (t2v_train.yaml UNet):
dim=320, dim_mult=[1,2,4,4], num_res_blocks=2, attn_scales=[1,1/2,1/4],
head_dim=64, context_dim=1024 → encoder entries: init conv+TT, then per
stage [Res(+TemporalConv) → Spatial → Temporal]×2 with Downsample between
stages; middle Res/Spatial/Temporal/Res; 12 decoder entries with skip
concat and Upsample; zero-init conv head.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    Downsample,
    RelativePositionBias,
    ResBlock,
    SpatialTransformer,
    TemporalAttentionMultiBlock,
    TemporalTransformer,
    TemporalTransformerAttemask,
    TimestepMLP,
    Upsample,
    sinusoidal_embedding,
)

Dtype = Any


def build_unet_plan(
    dim: int,
    dim_mult: Sequence[int],
    num_res_blocks: int,
    attn_scales: Sequence[float],
    temporal_attention: bool = True,
):
    """Statically enumerate the encoder/decoder block layout.

    Returns (enc_entries, dec_entries) where each entry is a list of
    (kind, name, channels_in, channels_out) tuples, mirroring the reference
    construction loop (unet_t2v.py:167-258) so that parameter names line up
    with released checkpoints (``input_blocks.3`` ↔ ``input_blocks_3``...).
    """
    enc_dims = [dim * u for u in [1] + list(dim_mult)]
    dec_dims = [dim * u for u in [dim_mult[-1]] + list(dim_mult)[::-1]]

    enc_entries = []
    shortcut_dims = []
    scale = 1.0

    # entry 0: init conv (+ temporal transformer)
    entry0 = [("conv_in", "input_blocks_0_0", None, dim)]
    if temporal_attention:
        entry0.append(("temporal", "input_blocks_0_1", dim, dim))
    enc_entries.append(entry0)
    shortcut_dims.append(dim)

    idx = 1
    for i, (cin, cout) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
        for j in range(num_res_blocks):
            entry = [("res", f"input_blocks_{idx}_0", cin, cout)]
            pos = 1
            if scale in attn_scales:
                entry.append(("spatial", f"input_blocks_{idx}_{pos}", cout, cout))
                pos += 1
                if temporal_attention:
                    entry.append(("temporal", f"input_blocks_{idx}_{pos}", cout, cout))
            enc_entries.append(entry)
            shortcut_dims.append(cout)
            cin = cout
            idx += 1
            if i != len(dim_mult) - 1 and j == num_res_blocks - 1:
                enc_entries.append([("down", f"input_blocks_{idx}", cout, cout)])
                shortcut_dims.append(cout)
                scale /= 2.0
                idx += 1

    # decoder
    dec_entries = []
    idx = 0
    for i, (cin, cout) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
        for j in range(num_res_blocks + 1):
            skip = shortcut_dims.pop()
            entry = [("res", f"output_blocks_{idx}_0", cin + skip, cout)]
            pos = 1
            if scale in attn_scales:
                entry.append(("spatial", f"output_blocks_{idx}_{pos}", cout, cout))
                pos += 1
                # temporal transformer gated like the encoder (reference
                # unet_t2v.py:241-250: only under self.temporal_attention)
                if temporal_attention:
                    entry.append(("temporal", f"output_blocks_{idx}_{pos}", cout, cout))
                    pos += 1
            cin = cout
            if i != len(dim_mult) - 1 and j == num_res_blocks:
                entry.append(("up", f"output_blocks_{idx}_{pos}", cout, cout))
                scale *= 2.0
            dec_entries.append(entry)
            idx += 1

    return enc_entries, dec_entries


class UNetSD_T2VBase(nn.Module):
    """Text→multiview 3D video UNet (reference unet_t2v.py:56-523)."""

    in_dim: int = 4
    dim: int = 320
    y_dim: int = 1024
    context_dim: int = 1024
    out_dim: int = 4
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    head_dim: int = 64
    camera_dim: int = 16
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = (1.0, 0.5, 0.25)
    dropout: float = 0.1
    temporal_attention: bool = True
    # which temporal mixer fills the "temporal" plan slots:
    #   'transformer' — TemporalTransformer (reference USE_TEMPORAL_TRANSFORMER
    #                   =True, unet_t2v.py:27 — the shipped-checkpoint path);
    #                   ``temporal_attn_times`` is ignored, as the reference
    #                   ignores it on this path
    #   'rotary'      — TemporalAttentionMultiBlock: temporal_attn_times ×
    #                   rotary attention + relative-position bias +
    #                   focus-present/video/sim masks (the dormant
    #                   USE_TEMPORAL_TRANSFORMER=False path, util.py:871-1345)
    #   'attemask'    — causal TemporalTransformer (util.py:1150-1247)
    temporal_block: str = "transformer"
    temporal_attn_times: int = 1
    use_sim_mask: bool = False
    use_checkpoint: bool = False
    # remat granularity when use_checkpoint=True (config key remat_policy):
    #   'full'          — save only block boundaries (max memory saving,
    #                     full recompute in backward; the reference
    #                     fairscale semantics)
    #   'dots_no_batch' — jax.checkpoint_policies.dots_with_no_batch_dims_
    #                     saveable: GEMM outputs survive to the backward,
    #                     only elementwise/norm work recomputes
    #   'dots'          — dots_saveable: every dot product saved (incl.
    #                     batched attention matmuls) — cheapest recompute,
    #                     highest residency
    remat_policy: str = "full"
    use_fps_condition: bool = False
    use_camera_condition: bool = True
    use_image_dataset: bool = False
    dtype: Dtype = jnp.float32

    def _remat_policy(self):
        if self.remat_policy == "full":
            return None
        if self.remat_policy == "dots_no_batch":
            return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        if self.remat_policy == "dots":
            return jax.checkpoint_policies.dots_saveable
        raise ValueError(f"unknown remat_policy {self.remat_policy!r}")

    def _block(self, kind, name, cin, cout):
        d = self.dtype
        # gradient checkpointing per block (reference fairscale
        # checkpoint_wrapper, unet_t2v.py:436-514) — jax.checkpoint via
        # nn.remat; forward-only programs are unaffected
        ck = self.use_checkpoint
        pol = self._remat_policy() if ck else None
        # nn.remat's static_argnums count the scope as args[0], so call-arg
        # i is static_argnums i+1
        res_cls = nn.remat(ResBlock, static_argnums=(3, 4), policy=pol) if ck else ResBlock
        sp_cls = nn.remat(SpatialTransformer, static_argnums=(3,), policy=pol) if ck else SpatialTransformer
        tp_cls = nn.remat(TemporalTransformer, static_argnums=(2,), policy=pol) if ck else TemporalTransformer
        if kind == "conv_in":
            return nn.Conv(cout, kernel_size=(3, 3), padding=1, dtype=d, name=name)
        if kind == "res":
            return res_cls(
                channels=cin,
                emb_channels=self.dim * 4,
                dropout=self.dropout,
                out_channels=cout,
                use_image_dataset=self.use_image_dataset,
                dtype=d,
                name=name,
            )
        if kind == "spatial":
            return sp_cls(
                in_channels=cout,
                n_heads=cout // self.head_dim,
                d_head=self.head_dim,
                depth=1,
                context_dim=self.context_dim,
                dtype=d,
                name=name,
            )
        if kind == "temporal":
            if self.temporal_block == "rotary":
                # reference passes the UNet-level num_heads to every
                # MultiBlock (unet_t2v.py:175,194,225,250); the block then
                # recomputes dim_head = dim // heads itself (util.py:885)
                mb_cls = (
                    nn.remat(TemporalAttentionMultiBlock, static_argnums=(5,), policy=pol)
                    if ck
                    else TemporalAttentionMultiBlock
                )
                return mb_cls(
                    dim=cout,
                    heads=self.num_heads,
                    rotary_dim=min(32, self.head_dim),
                    temporal_attn_times=self.temporal_attn_times,
                    use_image_dataset=self.use_image_dataset,
                    use_sim_mask=self.use_sim_mask,
                    dtype=d,
                    name=name,
                )
            if self.temporal_block == "attemask":
                am_cls = (
                    nn.remat(TemporalTransformerAttemask, static_argnums=(2,), policy=pol)
                    if ck
                    else TemporalTransformerAttemask
                )
            elif self.temporal_block == "transformer":
                am_cls = tp_cls
            else:
                raise ValueError(f"unknown temporal_block {self.temporal_block!r}")
            # the init block (dim→512 inner) keeps the configured num_heads;
            # all later temporal transformers use cout//head_dim heads
            # (reference unet_t2v.py:172 vs :191)
            n_heads = self.num_heads if name == "input_blocks_0_1" else cout // self.head_dim
            return am_cls(
                in_channels=cout,
                n_heads=n_heads,
                d_head=self.head_dim,
                depth=1,
                multiply_zero=self.use_image_dataset,
                dtype=d,
                name=name,
            )
        if kind == "down":
            return Downsample(cout, dtype=d, name=name)
        if kind == "up":
            return Upsample(cout, dtype=d, name=name)
        raise ValueError(kind)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        fps: Optional[jnp.ndarray] = None,
        camera_data: Optional[jnp.ndarray] = None,
        zero_y: Optional[jnp.ndarray] = None,
        video_mask: Optional[jnp.ndarray] = None,
        focus_present_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: [B, C, F, H, W] (reference layout), t: [B], y: [B, L, y_dim],
        camera_data: [B, F, 16]. ``video_mask [B, F]`` / ``focus_present_mask
        [B]`` feed the rotary temporal-attention path only (reference
        unet_t2v.py:296-320). Returns [B, C, F, H, W]."""
        b, c, f, hh, ww = x.shape
        embed_dim = self.dim * 4

        # relative-position bias for the rotary temporal path (reference
        # unet_t2v.py:163-165,317-319: heads=num_heads, max_distance=32)
        pos_bias = None
        if self.temporal_attention and self.temporal_block == "rotary":
            pos_bias = RelativePositionBias(
                heads=self.num_heads, max_distance=32, name="time_rel_pos_bias"
            )(f)

        # ---- embeddings (unet_t2v.py:322-335)
        e = TimestepMLP(embed_dim, dtype=self.dtype, name="time_embed")(
            sinusoidal_embedding(t, self.dim)
        )
        if self.use_fps_condition and fps is not None:
            e = e + TimestepMLP(embed_dim, zero_init=True, dtype=self.dtype, name="fps_embedding")(
                sinusoidal_embedding(fps, self.dim)
            )
        # repeat per frame: [B, E] -> [B*F, E]
        e = jnp.repeat(e, f, axis=0)
        if self.use_camera_condition and camera_data is not None:
            cam = camera_data.reshape(b * f, self.camera_dim).astype(self.dtype)
            e = e + TimestepMLP(
                embed_dim, zero_init=True, dtype=self.dtype, name="camera_embedding"
            )(cam)
        e = e.astype(self.dtype)

        # ---- context (unet_t2v.py:338-346)
        if y is None:
            assert zero_y is not None, "need y or zero_y"
            y = jnp.broadcast_to(zero_y[:, :1, :], (b, 1, self.context_dim))
        context = jnp.repeat(y.astype(self.dtype), f, axis=0)  # [B*F, L, Cctx]

        # ---- layout: [B,C,F,H,W] -> [B*F, H, W, C]
        h = x.transpose(0, 2, 3, 4, 1).reshape(b * f, hh, ww, c).astype(self.dtype)

        enc_entries, dec_entries = build_unet_plan(
            self.dim, self.dim_mult, self.num_res_blocks, self.attn_scales,
            self.temporal_attention,
        )

        def run_entry(h, entry):
            for kind, name, cin, cout in entry:
                mod = self._block(kind, name, cin, cout)
                if kind == "conv_in" or kind in ("down", "up"):
                    h = mod(h)
                elif kind == "res":
                    h = mod(h, e, f, deterministic)
                elif kind == "spatial":
                    h = mod(h, context, deterministic)
                elif kind == "temporal":
                    bf, hh_, ww_, c_ = h.shape
                    ht = h.reshape(b, f, hh_, ww_, c_)
                    if self.temporal_block == "rotary":
                        ht = mod(ht, pos_bias, focus_present_mask, video_mask, deterministic)
                    else:
                        ht = mod(ht, deterministic)
                    h = ht.reshape(bf, hh_, ww_, c_)
            return h

        # encoder
        xs = []
        for entry in enc_entries:
            h = run_entry(h, entry)
            xs.append(h)

        # middle (unet_t2v.py:208-227): Res, Spatial[, Temporal], Res — the
        # temporal member is appended only under temporal_attention, which
        # shifts the final ResBlock's checkpoint index (2 vs 3)
        mid_ch = self.dim * self.dim_mult[-1]
        mid_entries = [
            ("res", "middle_block_0", mid_ch, mid_ch),
            ("spatial", "middle_block_1", mid_ch, mid_ch),
        ]
        if self.temporal_attention:
            mid_entries.append(("temporal", "middle_block_2", mid_ch, mid_ch))
            mid_entries.append(("res", "middle_block_3", mid_ch, mid_ch))
        else:
            mid_entries.append(("res", "middle_block_2", mid_ch, mid_ch))
        h = run_entry(h, mid_entries)

        # decoder with skip concat
        for entry in dec_entries:
            h = jnp.concatenate([h, xs.pop()], axis=-1)
            h = run_entry(h, entry)

        # head (unet_t2v.py:261-265): GN, SiLU, zero-init conv
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="out_0")(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_dim,
            kernel_size=(3, 3),
            padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="out_2",
        )(h)

        # back to [B, C, F, H, W]
        out = h.reshape(b, f, hh, ww, self.out_dim).transpose(0, 4, 1, 2, 3)
        return out.astype(jnp.float32)
