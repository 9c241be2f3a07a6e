"""LGM reconstructor: shapes, activation ranges, end-to-end render+grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomv_tpu.data.cameras import GSCameraSettings, orbit_c2w_opengl, prepare_gs_training
from videomv_tpu.models.lgm import LGM, LGMOptions
from videomv_tpu.ops.gaussian_splat import render_gaussians

TINY = LGMOptions(
    input_size=32,
    down_channels=(32, 64),
    down_attention=(False, True),
    mid_attention=True,
    up_channels=(64, 32),
    up_attention=(True, False),
    splat_size=32,
    output_size=32,
)


@pytest.fixture(scope="module")
def lgm_setup():
    model = LGM(opt=TINY)
    x = jnp.zeros((1, 4, 9, TINY.input_size, TINY.input_size))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    fwd = jax.jit(model.apply)
    return model, params, fwd


def test_lgm_output_shapes_and_ranges(lgm_setup):
    model, params, fwd = lgm_setup
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 9, 32, 32))
    g = fwd(params, x)
    S = TINY.splat_size
    assert g.shape == (2, 4 * S * S, 14)
    gn = np.asarray(g)
    # activation ranges (reference core/models.py:39-43)
    assert gn[..., 0:3].min() >= -1 and gn[..., 0:3].max() <= 1        # pos
    assert gn[..., 3:4].min() >= 0 and gn[..., 3:4].max() <= 1          # opacity
    assert gn[..., 4:7].min() >= 0                                       # scale
    # reference quirk (core/models.py:42): bare F.normalize uses dim=1, so
    # each quat COMPONENT is unit-normalized across the N Gaussians — not
    # per-quaternion (see test_reference_parity.py)
    norms = np.linalg.norm(gn[..., 7:11], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)                    # quat
    assert gn[..., 11:14].min() >= 0 and gn[..., 11:14].max() <= 1       # rgb


@pytest.mark.slow
def test_lgm_render_loss_grad(lgm_setup):
    """Full LGM → splat render → MSE loss gradient (the training refine
    path, reference core/models.py:136-188 minus LPIPS)."""
    model, params, _ = lgm_setup
    settings = GSCameraSettings(input_size=32, output_size=32)
    cams = prepare_gs_training(
        orbit_c2w_opengl(4, elevation=0, camera_distance=2.0), settings, ray_size=32
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 9, 32, 32)) * 0.1
    target = jnp.full((1, 4, 3, 32, 32), 0.5)

    def loss_fn(p):
        g = model.apply(p, x)
        out = render_gaussians(
            g, jnp.asarray(cams["cam_view"][:, :4]),
            jnp.asarray(cams["cam_view_proj"][:, :4]),
            bg_color=jnp.full((3,), 0.5), img_size=32, backend="dense",
        )
        return jnp.mean((out["image"] - target) ** 2)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    gmax = max(
        float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(gmax) and gmax > 0
