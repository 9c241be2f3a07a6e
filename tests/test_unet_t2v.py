"""Shape/structure tests for the T2V UNet (tiny config, single jitted apply —
eager dispatch is prohibitively slow in this environment, so every test
shares one compiled function)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomv_tpu.models import UNetSD_T2VBase, build_unet_plan


def test_build_plan_matches_reference_layout():
    """The full-size plan must enumerate 12 encoder + 12 decoder entries
    exactly as the reference ctor does (unet_t2v.py:167-258)."""
    enc, dec = build_unet_plan(320, (1, 2, 4, 4), 2, (1.0, 0.5, 0.25))
    assert len(enc) == 12
    assert len(dec) == 12
    kinds0 = [k for k, *_ in enc[0]]
    assert kinds0 == ["conv_in", "temporal"]
    down_names = [e[0][1] for e in enc if e[0][0] == "down"]
    assert down_names == ["input_blocks_3", "input_blocks_6", "input_blocks_9"]
    # stage-3 encoder entries (scale 1/8) carry no attention
    assert [k for k, *_ in enc[10]] == ["res"]
    assert [k for k, *_ in enc[11]] == ["res"]
    # decoder stage 0 has no attention; entry 2 ends with upsample
    assert [k for k, *_ in dec[0]] == ["res"]
    assert [k for k, *_ in dec[2]] == ["res", "up"]
    assert [k for k, *_ in dec[3]] == ["res", "spatial", "temporal"]
    assert [k for k, *_ in dec[11]] == ["res", "spatial", "temporal"]
    # channel bookkeeping
    assert dec[0][0][2] == 2560
    assert dec[11][0][2] == 320 + 320


@pytest.fixture(scope="module")
def tiny_unet():
    model = UNetSD_T2VBase(
        in_dim=4, dim=64, y_dim=32, context_dim=32, out_dim=4,
        dim_mult=(1, 2), num_heads=2, head_dim=16, num_res_blocks=1,
        attn_scales=(1.0,), dropout=0.0, use_camera_condition=True,
    )
    b, f = 1, 4
    x = jnp.zeros((b, 4, f, 16, 16))
    t = jnp.array([500], dtype=jnp.int32)
    y = jnp.zeros((b, 7, 32))
    cam = jnp.zeros((b, f, 16))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, y=y, camera_data=cam)
    apply_fn = jax.jit(
        lambda p, x, t, y, cam: model.apply(p, x, t, y=y, camera_data=cam)
    )
    return model, params, apply_fn


def test_forward_shape_zero_init_and_camera_noop(tiny_unet):
    model, params, apply_fn = tiny_unet
    b, f = 1, 4
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (b, 4, f, 16, 16))
    t = jnp.array([10], dtype=jnp.int32)
    y = jax.random.normal(jax.random.fold_in(rng, 1), (b, 7, 32))
    cam0 = jnp.zeros((b, f, 16))
    out = apply_fn(params, x, t, y, cam0)
    assert out.shape == (b, 4, f, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))
    # zero-init output conv ⇒ exactly zero at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    # zero-init camera MLP ⇒ camera data must not change outputs at init
    cam1 = jax.random.normal(jax.random.fold_in(rng, 2), (b, f, 16)) * 10
    out2 = apply_fn(params, x, t, y, cam1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_param_names_match_torch_layout(tiny_unet):
    model, params, _ = tiny_unet
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k.key) for k in path if hasattr(k, "key")) for path, _ in flat}
    assert any("time_embed/0/kernel" in n for n in names)
    assert any("input_blocks_0_0/kernel" in n for n in names)
    assert any("input_blocks_0_1/proj_in" in n for n in names)
    assert any("input_blocks_1_0/in_layers_2/kernel" in n for n in names)
    assert any("input_blocks_1_0/temopral_conv/conv1_2/kernel" in n for n in names)
    assert any("middle_block_1/transformer_blocks_0/attn2/to_k/kernel" in n for n in names)
    assert any("out_2/kernel" in n for n in names)
