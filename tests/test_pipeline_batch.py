"""Batched multi-prompt sampling, dp-sharded over the 8-device CPU mesh.

The reference inference loops prompts on one GPU; ``generate_batch``
compiles ONE program over B prompts and (with ``data_parallel``) shards
the batch over the mesh — GSPMD runs each prompt's denoising on its own
device with replicated params."""

import jax
import numpy as np
import pytest

from videomv_tpu.config import load_inference_config
from videomv_tpu.inference import T2VPipeline


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = load_inference_config("configs/t2v_infer_tiny.yaml")
    pipe = T2VPipeline(cfg, seed=0)
    pipe.init_params(load=False)
    return pipe


@pytest.mark.slow
def test_generate_batch_dp_sharded(tiny_pipe):
    assert jax.device_count() == 8
    prompts = [f"object {i}" for i in range(8)]
    out = tiny_pipe.generate_batch(
        prompts, steps=2, use_gs_refine=False, seed=3, data_parallel=True
    )
    f = tiny_pipe.max_frames
    hres = tiny_pipe.resolution[1]
    assert out["frames"].shape == (8, f, hres, hres, 3)
    assert np.isfinite(out["latents"]).all()
    # different prompts must produce different outputs (conditioning flows)
    assert not np.array_equal(out["frames"][0], out["frames"][1])


@pytest.mark.slow
def test_generate_batch_matches_single(tiny_pipe):
    """A batch of identical prompts with the same seed must contain rows
    that equal each other (the batched program treats rows independently
    up to the per-batch noise draw)."""
    out = tiny_pipe.generate_batch(["a red cube"] * 2, steps=2, seed=5)
    # rows differ only through their noise draws; latents must be finite
    # and the program must produce the full [2, ...] batch
    assert out["frames"].shape[0] == 2
    assert np.isfinite(out["latents"]).all()


@pytest.mark.slow
def test_generate_batch_pad_and_mask(tiny_pipe):
    """B=3 on an 8-device mesh with data_parallel: the batch pads to 8,
    shards, and the padding rows are dropped from the output — callers get
    dp execution instead of a silent single-device fallback."""
    prompts = [f"thing {i}" for i in range(3)]
    out = tiny_pipe.generate_batch(
        prompts, steps=2, use_gs_refine=False, seed=3, data_parallel=True
    )
    f = tiny_pipe.max_frames
    hres = tiny_pipe.resolution[1]
    assert out["frames"].shape == (3, f, hres, hres, 3)
    assert out["latents"].shape[0] == 3
    assert np.isfinite(out["latents"]).all()
    # the padded program is the same specialization as a full B=8 batch
    assert any(k[3] == 8 for k in tiny_pipe._samplers)


@pytest.mark.slow
def test_generate_batch_dp_with_refine_matches_single():
    """dp-batched GS refine: the splat render runs as a batch-axis
    shard_map (each device rasterizes its local scenes). Must equal the
    single-device batched refined run."""
    from videomv_tpu.config import AttrDict
    from videomv_tpu.data.cameras import GSCameraSettings
    from videomv_tpu.models.autoencoder import AutoencoderKL
    from videomv_tpu.models.lgm import LGM, LGMOptions

    cfg = load_inference_config("configs/t2v_infer_tiny.yaml")
    cfg.resolution = [32, 32]
    cfg.UNet.use_lgm_refine = True
    cfg.gs_refine_uncond = "shared"
    cfg.gs_refine_steps = [1]          # fires inside the 2-step budget
    cfg.gs_refine_views = [0, 1, 2, 3]
    cfg.gs_input_size = 32
    cfg.gs_render_size = 32
    pipe = T2VPipeline(cfg, seed=0)
    pipe.vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 1, 2), num_res_blocks=1)
    pipe.lgm = LGM(opt=LGMOptions(
        input_size=32, down_channels=(32, 64), down_attention=(False, True),
        mid_attention=True, up_channels=(64, 32), up_attention=(True, False),
        splat_size=32, output_size=32, num_views=8, num_input_views=4,
    ))
    pipe.gs_settings = GSCameraSettings(input_size=32, output_size=32)
    pipe.init_params(load=False)

    prompts = [f"object {i}" for i in range(8)]
    base = pipe.generate_batch(prompts, steps=2, use_gs_refine=True, seed=4)
    assert np.isfinite(base["latents"]).all()
    dp = pipe.generate_batch(
        prompts, steps=2, use_gs_refine=True, seed=4, data_parallel=True
    )
    # per-shard GEMMs tile differently at 1/8 the rows, so fp32
    # accumulation order shifts; measured max |Δ| ≈ 2.5e-3 through the
    # 2-step diffusion+refine algebra. A real mis-sharding diverges
    # wholesale — this bound still pins structural equality.
    np.testing.assert_allclose(
        dp["latents"], base["latents"], rtol=1e-3, atol=4e-3
    )


@pytest.mark.slow
def test_generate_batch_single_device_falls_back(tiny_pipe, monkeypatch):
    """On ONE device the batched program is a measured 0.83× regression
    (PERF.md, scripts/batch_throughput_tpu.py), so generate_batch must loop
    the single-sample program instead of compiling a B-row one."""
    import videomv_tpu.inference.pipeline as pl

    monkeypatch.setattr(pl.jax, "device_count", lambda: 1)
    before = set(tiny_pipe._samplers)
    prompts = ["a red cube", "a blue sphere", "a green cone"]
    out = tiny_pipe.generate_batch(prompts, steps=2, seed=11)
    f = tiny_pipe.max_frames
    hres = tiny_pipe.resolution[1]
    assert out["frames"].shape == (3, f, hres, hres, 3)
    assert out["latents"].shape[0] == 3
    assert np.isfinite(out["latents"]).all()
    assert not np.array_equal(out["frames"][0], out["frames"][1])
    # only single-sample (b=1) programs were added — no batched compile
    assert all(k[3] == 1 for k in set(tiny_pipe._samplers) - before)
    # force_batched overrides the fallback (A/B harnesses need the B-row
    # program on one device)
    forced = tiny_pipe.generate_batch(
        prompts, steps=2, seed=11, force_batched=True)
    assert any(k[3] == 3 for k in tiny_pipe._samplers)
    assert forced["frames"].shape == out["frames"].shape


@pytest.mark.slow
def test_params_dtype_bf16_storage():
    """``params_dtype: bfloat16`` halves parameter residency for serving
    (the fp32 I2V stack OOMed the 16 GB v5e — PERF.md round 4). All fp32
    leaves cast; sampling still runs."""
    import jax.numpy as jnp

    cfg = load_inference_config("configs/t2v_infer_tiny.yaml")
    cfg.params_dtype = "bfloat16"
    pipe = T2VPipeline(cfg, seed=0)
    pipe.init_params(load=False)
    leaves = jax.tree_util.tree_leaves(pipe._params)
    assert leaves and all(
        l.dtype == jnp.bfloat16 for l in leaves
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating))
    out = pipe.generate("a cat", steps=2, seed=1)
    assert np.isfinite(out["latents"]).all()


def test_params_dtype_ignored_under_fp32_sampling(caplog):
    """fp32 sampling is the acceptance escape hatch — bf16 storage would
    silently reintroduce the drift it exists to measure, so the cast must
    be skipped (with a warning), not applied."""
    import logging

    import jax.numpy as jnp

    cfg = load_inference_config("configs/t2v_infer_tiny.yaml")
    cfg.params_dtype = "bfloat16"
    cfg.sampling_dtype = "float32"
    pipe = T2VPipeline(cfg, seed=0)
    with caplog.at_level(logging.WARNING,
                         logger="videomv_tpu.inference.pipeline"):
        pipe.init_params(load=False)
    leaves = jax.tree_util.tree_leaves(pipe._params)
    assert all(l.dtype != jnp.bfloat16 for l in leaves if hasattr(l, "dtype"))
    assert any("params_dtype" in r.message for r in caplog.records)


def test_hash_tokenizer_fallback_warns(caplog):
    """Absent BPE vocab must WARN loudly (garbage conditioning with real
    weights otherwise goes unnoticed)."""
    import logging

    from videomv_tpu.data import tokenizer as tk

    tk._tokenizer_cache.pop("definitely/missing/vocab.txt.gz", None)
    with caplog.at_level(logging.WARNING, logger="videomv_tpu.data.tokenizer"):
        tok = tk.get_tokenizer("definitely/missing/vocab.txt.gz")
    assert isinstance(tok, tk.HashTokenizer)
    assert any("hash" in r.message.lower() for r in caplog.records)
