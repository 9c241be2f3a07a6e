"""LPIPS perceptual distance (VGG16 backbone) for LGM supervision.

The reference supervises the LGM's re-rendered views with
``loss = MSE + lambda_lpips * LPIPS(net='vgg')`` at ``lambda_lpips=1.0``
(/root/reference/core/models.py:30-37,46-47,167-184; core/options.py:63).
Its LPIPS comes from ``kiui.lpips`` — a vendored copy of the richzhang
LPIPS package: a frozen torchvision VGG16 feature tower sliced at
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, per-channel unit normalization,
learned 1×1 "lin" heads, spatial mean, summed over the five taps.

This is a from-scratch Flax implementation. Parameter names mirror the
torch state-dict keys of the pretrained ``vgg.pth`` (dots→underscores:
``net.slice2.5.weight`` → module ``net_slice2_5``; ``lin0.model.1.weight``
→ ``lin0_model_1``) so ``map_torch_to_flax`` converts it mechanically.
Inputs are NCHW images in [-1, 1], exactly like the torch module.

TPU notes: the tower is 13 convs of 3×3 — pure MXU work in NHWC; we keep
the public NCHW contract and transpose once at entry. It runs only inside
the LGM-refine training loss (not the sampler hot path).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torchvision VGG16 `features` indices of the conv layers in each slice
_SLICES: Tuple[Tuple[int, ...], ...] = (
    (0, 2),            # → relu1_2, 64ch
    (5, 7),            # → relu2_2, 128ch
    (10, 12, 14),      # → relu3_3, 256ch
    (17, 19, 21),      # → relu4_3, 512ch
    (24, 26, 28),      # → relu5_3, 512ch
)
_CHANNELS: Tuple[int, ...] = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
_TAP_CHANNELS: Tuple[int, ...] = (64, 128, 256, 512, 512)

# richzhang ScalingLayer constants (buffers in the torch checkpoint; fixed)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Channel-unit normalization (lpips.normalize_tensor). NHWC."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance d(x0, x1) per batch element.

    ``__call__(x0, x1)`` with NCHW float images in [-1, 1] → [B] distances.
    All parameters are frozen at use time (the caller never differentiates
    w.r.t. them — only through them to the rendered image).
    """

    dtype: Dtype = jnp.float32

    def _vgg_taps(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        """Run the sliced VGG16 tower; x is NHWC after the scaling layer."""
        taps = []
        ch_iter = iter(_CHANNELS)
        for si, conv_ids in enumerate(_SLICES):
            if si > 0:  # each later slice starts with the 2×2 maxpool
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci in conv_ids:
                x = nn.Conv(
                    next(ch_iter), kernel_size=(3, 3), padding=1,
                    dtype=self.dtype, name=f"net_slice{si + 1}_{ci}",
                )(x)
                x = nn.relu(x)
            taps.append(x)
        return taps

    @nn.compact
    def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, self.dtype).reshape(1, 1, 1, 3)
        scale = jnp.asarray(_SCALE, self.dtype).reshape(1, 1, 1, 3)

        # NCHW → NHWC, scaling layer
        def prep(x):
            x = x.astype(self.dtype).transpose(0, 2, 3, 1)
            return (x - shift) / scale

        # one fused tower pass over the stacked pair keeps the convs batched
        b = x0.shape[0]
        taps = self._vgg_taps(jnp.concatenate([prep(x0), prep(x1)], axis=0))

        total = jnp.zeros((b,), self.dtype)
        for i, t in enumerate(taps):
            f0, f1 = _unit_normalize(t[:b]), _unit_normalize(t[b:])
            diff = (f0 - f1) ** 2
            # lin head: 1×1 conv, no bias (NetLinLayer.model[1])
            w = nn.Conv(
                1, kernel_size=(1, 1), use_bias=False, dtype=self.dtype,
                name=f"lin{i}_model_1",
            )(diff)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def convert_lpips(torch_sd, flax_params, strict: bool = False):
    """kiui/richzhang LPIPS ``vgg.pth`` state dict → our params.

    Accepts both the attribute form (``lin0.model.1.weight``) and the
    ModuleList form (``lins.0.model.1.weight``); drops the scaling-layer
    buffers (compiled-in constants here).
    """
    from ..training.checkpoints import map_torch_to_flax

    def rename(k: str):
        if k.startswith("lpips_loss."):
            k = k[len("lpips_loss."):]
        if k.startswith("scaling_layer."):
            return None
        m = k
        if m.startswith("lins."):
            idx, rest = m[len("lins."):].split(".", 1)
            m = f"lin{idx}.{rest}"
        return m

    return map_torch_to_flax(torch_sd, flax_params, rename=rename, strict=strict)
