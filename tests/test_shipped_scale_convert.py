"""Shipped-scale checkpoint-converter coverage (VERDICT r4 missing #1).

The PSNR ≥ 30 acceptance run (BASELINE.md) will load the released torch
checkpoints exactly once, at the REAL geometry (dim=320, 4 stages, per-level
head counts, 1.4B params) — the tiny-dim parity tests in
test_reference_parity.py cannot catch a key family that only exists at that
scale. Here the torch reference models are constructed at the shipped
configs on the meta device (shapes, no RAM) and their full state dicts are
pushed through the real converters against ``jax.eval_shape`` templates of
our models built the same way the pipelines build them
(``unet_kwargs_from_cfg``). ``materialize=False`` keeps the whole audit
allocation-free while still exercising every key-match and layout-transpose
shape check.

Coverage contract, both directions (reference load sites:
inference_text2video_entrance.py:137-144, unet_t2v.py:56-265,
autoencoder.py:33-74, core/models.py:14-48):
  - zero unexpected torch keys  (every released tensor lands somewhere)
  - zero missing flax leaves    (every parameter of ours gets filled)
  - zero shape mismatches       (every transpose rule holds at full width)
"""

import json
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_oracle import load as load_ref
from videomv_tpu.config import load_config
from videomv_tpu.inference.pipeline import unet_kwargs_from_cfg
from videomv_tpu.training.checkpoints import convert_lgm, convert_unet, convert_vae


def _fake_sd(module: "torch.nn.Module"):
    """Zero-stride numpy stand-ins for a meta-device state dict (shape-true,
    allocation-free; transposes in the converter are views)."""
    return {
        k: np.broadcast_to(np.zeros((), np.float32), tuple(v.shape))
        for k, v in module.state_dict().items()
    }


def _patch_lgm_deps():
    """GaussianRenderer allocates CUDA in __init__ (core/gs.py:20) and LPIPS
    needs torchvision weights; neither owns converted parameters."""
    ref_models = load_ref("core.models")
    ref_models.GaussianRenderer = lambda opt: types.SimpleNamespace()

    class _DummyLPIPS(torch.nn.Module):  # state_dict strips lpips anyway
        def __init__(self, *a, **k):
            super().__init__()

    ref_models.LPIPS = _DummyLPIPS
    return ref_models


def _spec(*shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


@pytest.fixture(scope="module")
def t2v_shipped():
    """(torch fake sd, flax eval_shape template) at configs/t2v_infer.yaml."""
    _patch_lgm_deps()
    ref = load_ref("tools.modules.unet.unet_t2v")
    cfg = load_config("configs/t2v_infer.yaml", opts=[])
    ucfg = {k: v for k, v in dict(cfg.UNet).items() if k != "type"}
    with torch.device("meta"):
        tmod = ref.UNetSD_T2VBase(**ucfg)
    sd = _fake_sd(tmod)

    from videomv_tpu.models import UNetSD_T2VBase

    fmod = UNetSD_T2VBase(**unet_kwargs_from_cfg(cfg.UNet))
    tmpl = jax.eval_shape(
        fmod.init, jax.random.PRNGKey(0), _spec(1, 4, 2, 8, 8),
        _spec(1, dtype=jnp.int32), y=_spec(1, 5, 1024),
        camera_data=_spec(1, 2, 16),
    )
    return sd, tmpl


@pytest.fixture(scope="module")
def i2v_shipped():
    _patch_lgm_deps()
    ref = load_ref("tools.modules.unet.unet_i2vgen")
    cfg = load_config("configs/i2vgen_xl_infer.yaml", opts=[])
    ucfg = {k: v for k, v in dict(cfg.UNet).items() if k != "type"}
    with torch.device("meta"):
        tmod = ref.UNetSD_I2VGen(**ucfg)
    sd = _fake_sd(tmod)

    from videomv_tpu.models import UNetSD_I2VGen

    fmod = UNetSD_I2VGen(**unet_kwargs_from_cfg(cfg.UNet))
    # hw=32 = the real 256→32 latent geometry (AdaptiveAvgPool identity)
    tmpl = jax.eval_shape(
        fmod.init, jax.random.PRNGKey(0), _spec(1, 4, 2, 32, 32),
        _spec(1, dtype=jnp.int32), y=_spec(1, 5, 1024),
        camera_data=_spec(1, 2, 16), local_image=_spec(1, 4, 1, 32, 32),
        image=_spec(1, 1024),
    )
    return sd, tmpl


def test_t2v_converter_coverage_at_shipped_scale(t2v_shipped):
    sd, tmpl = t2v_shipped
    # 1.4B denoiser + 0.4B lgm_big submodule ride the same released .pth
    assert sum(int(np.prod(v.shape)) for v in sd.values()) > 1.7e9
    _, report = convert_unet(sd, tmpl, strict=True, materialize=False)
    n_lgm = sum(k.startswith("lgm_big.") for k in sd)
    assert len(report["matched"]) == len(sd) - n_lgm


def test_lgm_big_converter_coverage_at_shipped_scale(t2v_shipped):
    """The lgm_big.* subtree of the released UNet .pth fills the full 'big'
    LGM (the shipped lgm_variant, pipeline.py) with nothing left over."""
    sd, _ = t2v_shipped
    sub = {k: v for k, v in sd.items() if k.startswith("lgm_big.")}
    assert len(sub) > 300

    from videomv_tpu.models.lgm import LGM, LGMOptions

    fmod = LGM(opt=LGMOptions.big())
    tmpl = jax.eval_shape(fmod.init, jax.random.PRNGKey(0), _spec(1, 4, 9, 256, 256))
    _, report = convert_lgm(sub, tmpl, strict=True, materialize=False)
    assert len(report["matched"]) == len(sub)


def test_i2v_converter_coverage_at_shipped_scale(i2v_shipped):
    sd, tmpl = i2v_shipped
    _, report = convert_unet(sd, tmpl, strict=True, materialize=False)
    n_lgm = sum(k.startswith("lgm_big.") for k in sd)
    assert len(report["matched"]) == len(sd) - n_lgm


def test_vae_converter_coverage_at_shipped_scale():
    """SD KL-VAE at the shipped ddconfig (reference config.py:110-126:
    ch=128, ch_mult [1,2,4,4], 2 res blocks, embed_dim 4)."""
    ref = load_ref("tools.modules.autoencoder")
    ddconfig = dict(
        double_z=True, z_channels=4, resolution=256, in_channels=3, out_ch=3,
        ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
        dropout=0.0,
    )
    with torch.device("meta"):
        tmod = ref.AutoencoderKL(ddconfig, embed_dim=4)
    sd = _fake_sd(tmod)

    from videomv_tpu.models.autoencoder import AutoencoderKL

    fmod = AutoencoderKL()  # pipeline builds it with defaults = shipped
    tmpl = jax.eval_shape(fmod.init, jax.random.PRNGKey(0), _spec(1, 3, 256, 256))
    _, report = convert_vae(sd, tmpl, strict=True, materialize=False)
    assert len(report["matched"]) == len(sd)


SD_KEYS_JSON = "data/stable_diffusion_image_key_temporal_attention_x1.json"


def test_sd_grad_scale_keys_pin_shipped_tree(t2v_shipped):
    """The vendored 682-key grad-scale list (reference
    pretrain_functions.py:19-51) must (a) be a subset of the released T2V
    checkpoint key surface, (b) convert onto our tree, and (c) be matched —
    exactly — by the optimizer's sd_key_matcher (VERDICT r4 missing #2)."""
    from videomv_tpu.training.optim import sd_key_matcher

    with open(SD_KEYS_JSON) as f:
        keys = json.load(f)
    assert len(keys) == 682

    sd, tmpl = t2v_shipped
    missing_in_ckpt = [k for k in keys if k not in sd]
    assert not missing_in_ckpt, missing_in_ckpt[:5]

    sub = {k: sd[k] for k in keys}
    _, report = convert_unet(sub, tmpl, materialize=False)
    assert not report["unexpected"] and not report["mismatched"]
    assert len(report["matched"]) == 682

    # the optimizer predicate must mark exactly the listed parameters
    import re

    match = sd_key_matcher(SD_KEYS_JSON)
    flat = jax.tree_util.tree_flatten_with_path(tmpl)[0]
    matched_stems = set()
    for path, _ in flat:
        parts = [str(p.key) for p in path if hasattr(p, "key")]
        if parts and parts[0] == "params":
            parts = parts[1:]
        joined = "_".join(parts)
        if match(joined):
            matched_stems.add(re.sub(r"_(kernel|scale|bias|embedding)$", "", joined))
    listed_stems = {
        re.sub(r"\.(weight|bias)$", "", k).replace(".", "_") for k in keys
    }
    assert matched_stems == listed_stems
