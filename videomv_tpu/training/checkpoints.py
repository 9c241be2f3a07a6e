"""Checkpoint I/O: torch ``.pth``/safetensors → Flax pytrees, plus orbax
save/restore for native training state.

The reference ships torch checkpoints (UNet ``.pth`` dicts with
``{state_dict, step}``, the SD VAE ``VQGAN_autoencoder.pth``, OpenCLIP
``open_clip_pytorch_model.bin``, LGM ``model.safetensors`` — see SURVEY.md
§5 checkpoint/resume).  Because our Flax modules name parameters after the
torch module paths (dots→underscores), conversion is a mechanical key match
plus rank-dependent layout transposes:

  torch Linear  (O, I)        → flax Dense kernel (I, O)
  torch Conv2d  (O, I, kh, kw)→ flax Conv kernel (kh, kw, I, O)
  torch Conv3d  (O, I, kt,kh,kw)→ flax Conv kernel (kt, kh, kw, I, O)
  torch Conv1d-k1 (O, I, 1)   → flax Dense kernel (I, O)   (our temporal
                                 transformers use Dense for the k=1 conv)
  torch norm weight (C,)      → flax scale
  torch Embedding (V, D)      → flax Embed embedding

Tolerant loading mirrors the reference behavior (strict=False inference
load, inference_text2video_entrance.py:137-144; shape-checked LGM resume,
unet_t2v.py:267-280): mismatches are collected and reported, not fatal.
"""

from __future__ import annotations

import io
import os
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "map_torch_to_flax",
    "convert_open_clip",
    "convert_vae",
    "convert_unet",
    "convert_lgm",
]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.pth``/``.bin`` or ``.safetensors`` file to numpy dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().to(torch.float32).numpy()
    return out


def _flatten_flax(params) -> Dict[str, Tuple[Tuple, Any]]:
    """{'a_b_c_kernel': (path, leaf_value)} over the full params pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, val in flat:
        keys = [str(p.key) for p in path if hasattr(p, "key")]
        joined_keys = keys[1:] if keys and keys[0] == "params" else keys
        out["_".join(joined_keys)] = (tuple(keys), val)
    return out


def _convert_tensor(t: np.ndarray, leaf: str, target_shape: Tuple[int, ...]) -> Optional[np.ndarray]:
    """Apply the rank-dependent layout transform; None if incompatible."""
    if leaf == "kernel":
        if t.ndim == 2:
            t = t.T
        elif t.ndim == 3 and t.shape[-1] == 1 and len(target_shape) == 2:
            t = t[:, :, 0].T  # conv1d k=1 -> dense
        elif t.ndim == 3:
            t = t.transpose(2, 1, 0)
        elif t.ndim == 4:
            t = t.transpose(2, 3, 1, 0)
        elif t.ndim == 5:
            t = t.transpose(2, 3, 4, 1, 0)
    if tuple(t.shape) != tuple(target_shape):
        return None
    return t


def map_torch_to_flax(
    torch_sd: Dict[str, np.ndarray],
    flax_params,
    rename: Optional[Callable[[str], Optional[str]]] = None,
    strict: bool = False,
    materialize: bool = True,
):
    """Match a torch state dict onto a flax params template.

    ``rename(torch_key) -> normalized key | None`` lets callers strip
    prefixes or drop keys.  Returns ``(new_params, report)`` where report
    lists matched/missing/unexpected/shape-mismatched keys.

    ``materialize=False`` runs the full key-matching and shape-transpose
    checks but never allocates converted tensors — ``flax_params`` may then
    be a ``jax.eval_shape`` template and ``torch_sd`` zero-stride fakes,
    which makes shipped-scale (1.4B-param) coverage audits near-free
    (tests/test_shipped_scale_convert.py). Returns the template unchanged.
    """
    flat = _flatten_flax(flax_params)
    new_leaves: Dict[Tuple, np.ndarray] = {}
    report = {"matched": [], "unexpected": [], "mismatched": [], "missing": []}

    for tkey, tens in torch_sd.items():
        key = rename(tkey) if rename is not None else tkey
        if key is None:
            continue
        base = key.replace(".", "_")
        if base.endswith("_weight"):
            stem = base[: -len("_weight")]
            candidates = [
                (stem + "_kernel", "kernel"),
                (stem + "_scale", "scale"),
                (stem + "_embedding", "embedding"),
            ]
        elif base.endswith("_bias"):
            candidates = [(base, "bias")]
        else:
            candidates = [(base, "raw")]

        hit = None
        for cand, leaf in candidates:
            if cand in flat:
                hit = (cand, leaf)
                break
        if hit is None:
            report["unexpected"].append(tkey)
            continue
        cand, leaf = hit
        path, template = flat[cand]
        conv = _convert_tensor(np.asarray(tens), leaf, np.shape(template))
        if conv is None:
            report["mismatched"].append((tkey, tuple(np.shape(tens)), tuple(np.shape(template))))
            continue
        if materialize:
            new_leaves[path] = jnp.asarray(conv, dtype=jnp.result_type(template))
        else:
            new_leaves[path] = None  # coverage bookkeeping only
        report["matched"].append(tkey)

    for joined, (path, template) in flat.items():
        if path not in new_leaves:
            report["missing"].append(joined)

    if strict and (report["missing"] or report["unexpected"] or report["mismatched"]):
        raise ValueError(
            f"strict load failed: {len(report['missing'])} missing, "
            f"{len(report['unexpected'])} unexpected, "
            f"{len(report['mismatched'])} shape mismatches; e.g. "
            f"missing={report['missing'][:5]} unexpected={report['unexpected'][:5]} "
            f"mismatched={report['mismatched'][:3]}"
        )

    if not materialize:
        return flax_params, report

    def rebuild(path_prefix, node):
        # reconstruct pytree with replaced leaves
        flat_all = jax.tree_util.tree_flatten_with_path(flax_params)
        leaves, treedef = jax.tree_util.tree_flatten(flax_params)
        # build in order of flatten
        new = []
        for path, val in flat_all[0]:
            keys = tuple(str(p.key) for p in path if hasattr(p, "key"))
            new.append(new_leaves.get(keys, val))
        return jax.tree_util.tree_unflatten(treedef, new)

    return rebuild((), flax_params), report


# --------------------------------------------------------------- per-model


def convert_unet(torch_sd: Dict[str, np.ndarray], flax_params, strict: bool = False, materialize: bool = True):
    """Map a UNetSD_T2VBase/I2VGen ``.pth`` state dict (keys like
    ``input_blocks.1.0.in_layers.2.weight``) onto our UNet params.
    LGM submodule weights (``lgm_big.*``) are routed separately."""

    def rename(k: str) -> Optional[str]:
        if k.startswith("lgm_big."):
            return None  # handled by convert_lgm
        if k.startswith("module."):
            k = k[len("module."):]
        # torch registers the Sequential head as out.0/out.2; our flax names
        # them out_0/out_2 already (underscore normalization handles this)
        return k

    return map_torch_to_flax(torch_sd, flax_params, rename=rename, strict=strict, materialize=materialize)


def convert_vae(torch_sd: Dict[str, np.ndarray], flax_params, strict: bool = False, materialize: bool = True):
    """SD KL-VAE (keys ``encoder.down.0.block.0.norm1.weight``,
    ``first_stage_model.``-prefixed in full SD dumps — prefix stripped like
    reference autoencoder.py:65-74)."""

    def rename(k: str) -> Optional[str]:
        if "first_stage_model" in k:
            k = k.split("first_stage_model.")[-1]
        if k.startswith("loss."):
            return None
        return k

    return map_torch_to_flax(torch_sd, flax_params, rename=rename, strict=strict, materialize=materialize)


def _split_in_proj(torch_sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Split torch MultiheadAttention packed qkv into q/k/v entries."""
    out = {}
    for k, v in torch_sd.items():
        m = re.match(r"(.*attn)\.in_proj_(weight|bias)$", k)
        if m:
            base, kind = m.groups()
            q, kk, vv = np.split(v, 3, axis=0)
            out[f"{base}.q.{kind}"] = q
            out[f"{base}.k.{kind}"] = kk
            out[f"{base}.v.{kind}"] = vv
        else:
            out[k] = v
    return out


def convert_open_clip(torch_sd: Dict[str, np.ndarray], flax_params, strict: bool = False, materialize: bool = True):
    """OpenCLIP ViT-H-14 ``open_clip_pytorch_model.bin`` → OpenCLIPTextVisual.

    Text keys are unprefixed in the torch dict (``transformer.resblocks...``,
    ``token_embedding``, ``ln_final``, ``text_projection``,
    ``positional_embedding``); visual keys carry ``visual.``.  Our module
    nests them under ``text``/``visual``.
    """
    torch_sd = _split_in_proj(torch_sd)

    def rename(k: str) -> Optional[str]:
        if k in ("logit_scale",):
            return None
        if k.startswith("visual."):
            rest = k[len("visual."):]
            return "visual." + rest
        # raw params need explicit leaf names
        return "text." + k

    return map_torch_to_flax(torch_sd, flax_params, rename=rename, strict=strict, materialize=materialize)


def convert_lgm(torch_sd: Dict[str, np.ndarray], flax_params, strict: bool = False, materialize: bool = True):
    """LGM ``model.safetensors`` (keys ``unet.down_blocks...``/``conv.weight``)
    or the ``lgm_big.``-prefixed subtree of a UNet checkpoint."""

    def rename(k: str) -> Optional[str]:
        if k.startswith("lgm_big."):
            k = k[len("lgm_big."):]
        if "lpips_loss" in k:
            return None
        return k

    return map_torch_to_flax(torch_sd, flax_params, rename=rename, strict=strict, materialize=materialize)
