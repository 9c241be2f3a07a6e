"""Config system: merge semantics, CLI parsing, AttrDict behavior."""

import os
import tempfile

import pytest

from videomv_tpu.config import AttrDict, load_config, load_inference_config
from videomv_tpu.config.config import apply_cli_opts, deep_update


def test_attrdict_access_and_coercion():
    d = AttrDict({"a": {"b": 1}, "lr": "3e-5"})
    assert d.a.b == 1
    assert isinstance(d.lr, float) and d.lr == 3e-5
    d.a.c = 2
    assert d["a"]["c"] == 2
    with pytest.raises(AttributeError):
        _ = d.missing


def test_deep_update_nested_dicts_update_not_replace():
    base = {"UNet": {"dim": 320, "heads": 8}, "lr": 1.0}
    deep_update(base, {"UNet": {"dim": 64}})
    assert base["UNet"] == {"dim": 64, "heads": 8}  # heads survives


def test_apply_cli_opts_depth_and_yaml_values():
    cfg = {"a": {"b": {"c": {"d": 1}}}, "flag": False, "lst": [1]}
    apply_cli_opts(cfg, ["a.b.c.d", "7", "flag", "true", "lst", "[1, 2]"])
    assert cfg["a"]["b"]["c"]["d"] == 7
    assert cfg["flag"] is True
    assert cfg["lst"] == [1, 2]
    with pytest.raises(AssertionError):
        apply_cli_opts(cfg, ["only-key"])  # odd length


def test_base_yaml_reference(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("shared: 5\nUNet: {dim: 320}\n")
    task = tmp_path / "task.yaml"
    task.write_text("_BASE: base.yaml\nUNet: {dim: 64}\nextra: 1\n")
    cfg = load_config(str(task), include_defaults=False)
    assert cfg.shared == 5
    assert cfg.UNet.dim == 64
    assert cfg.extra == 1


def test_shipped_configs_load():
    for f in (
        "configs/t2v_infer.yaml",
        "configs/i2vgen_xl_infer.yaml",
        "configs/t2v_train.yaml",
        "configs/i2vgen_xl_train.yaml",
        "configs/t2v_train_laion.yaml",
        "configs/t2v_infer_tiny.yaml",
        "configs/t2v_train_tiny.yaml",
        "configs/i2vgen_xl_infer_tiny.yaml",
    ):
        cfg = load_inference_config(f) if "infer" in f else load_config(f)
        assert cfg.get("TASK_TYPE"), f
        assert "UNet" in cfg, f
    # the inference merge pulls the train Diffusion block through vldm_cfg
    cfg = load_inference_config("configs/t2v_infer.yaml")
    assert cfg.Diffusion.schedule == "linear_sd"
    assert cfg.UNet.use_lgm_refine is True  # task yaml wins over linked
    # serving default: cond-row-only refine (measured ≥52.6 dB vs 'full';
    # scripts/refine_shared_tpu.py) — 'full' restores reference semantics
    assert cfg.gs_refine_uncond == "shared"


def test_acceptance_overrides_pin_reference_semantics():
    """The PSNR acceptance harness must force reference-exact settings
    (VERDICT r3 #6): full both-rows refine (diffusion_ddim.py:148-155),
    the reference inference camera chain, 512-pixel refine renders
    (unet_t2v.py:417-428), fp32 sampling. Pipeline construction must
    honor every override."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "psnr_vs_reference",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "psnr_vs_reference.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import jax.numpy as jnp

    from videomv_tpu.inference import T2VPipeline

    cfg = load_inference_config("configs/t2v_infer.yaml")
    cfg.update(mod.ACCEPTANCE_OVERRIDES)
    pipe = T2VPipeline(cfg)  # module construction only — no param init
    assert pipe.dtype == jnp.float32
    assert pipe.cfg.gs_refine_uncond == "full"
    assert pipe.cfg.reference_inference_cameras is True
    assert pipe.gs_settings.output_size == 512
