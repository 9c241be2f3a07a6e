"""Gaussian splat renderer: projection geometry, compositing identities,
and gradient flow (ground truth for the Pallas kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomv_tpu.data.cameras import (
    GSCameraSettings,
    orbit_c2w_opengl,
    prepare_gs_training,
)
from videomv_tpu.ops.gaussian_splat import (
    project_gaussians,
    quat_to_rotmat,
    render_gaussians,
)


def _gauss(pos, opacity=0.9, scale=0.05, rgb=(1.0, 0.0, 0.0)):
    return np.concatenate([
        np.asarray(pos, np.float32),
        [opacity],
        [scale] * 3,
        [1.0, 0.0, 0.0, 0.0],  # identity quat
        np.asarray(rgb, np.float32),
    ]).astype(np.float32)


@pytest.fixture(scope="module")
def cams():
    # training-chain cameras: every view looks at the canonical origin
    return prepare_gs_training(
        orbit_c2w_opengl(8, elevation=0, camera_distance=2.0),
        GSCameraSettings(), ray_size=16,
    )


def test_quat_identity():
    R = quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    # 90° about z: q = (cos45, 0, 0, sin45)
    s = np.sqrt(0.5)
    R = np.asarray(quat_to_rotmat(jnp.array([s, 0, 0, s])))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_center_gaussian_projects_to_center(cams):
    """A Gaussian at the canonical-frame origin lands at the image center
    for every orbit view."""
    g = jnp.asarray(_gauss([0.0, 0.0, 0.0]))[None]
    S = 64
    settings = GSCameraSettings()
    for v in range(0, 8, 3):
        mean2d, inv_cov, depth, radius, color, opacity, valid = project_gaussians(
            g, jnp.asarray(cams["cam_view"][0, v]),
            jnp.asarray(cams["cam_view_proj"][0, v]), S, settings.tan_half_fov,
        )
        assert bool(valid[0])
        np.testing.assert_allclose(
            np.asarray(mean2d[0]), [(S - 1) / 2, (S - 1) / 2], atol=0.5
        )
        assert 1.0 < float(depth[0]) < 3.0  # roughly cam distance


@pytest.fixture(scope="module")
def rendered(cams):
    """One render shared by several assertions (compile once)."""
    gs = np.stack([
        _gauss([0.0, 0.0, 0.0], rgb=(1, 0, 0), scale=0.08, opacity=0.95),
        _gauss([0.4, 0.0, 0.0], rgb=(0, 1, 0), scale=0.05, opacity=0.9),
    ])
    g = jnp.asarray(gs)[None]  # [1, 2, 14]
    out = jax.jit(
        lambda g: render_gaussians(
            g,
            jnp.asarray(cams["cam_view"][:, :2]),
            jnp.asarray(cams["cam_view_proj"][:, :2]),
            bg_color=jnp.zeros(3),
            img_size=64,
            backend="dense",
        )
    )(g)
    return out


def test_render_shapes_and_alpha(rendered):
    img, alpha = rendered["image"], rendered["alpha"]
    assert img.shape == (1, 2, 3, 64, 64)
    assert alpha.shape == (1, 2, 1, 64, 64)
    a = np.asarray(alpha)
    assert a.min() >= 0.0 and a.max() <= 1.0
    # something was drawn
    assert a.max() > 0.5
    img_np = np.asarray(img)
    # center pixel is red-dominant (red gaussian sits at origin, drawn first)
    c = img_np[0, 0, :, 32, 32]
    assert c[0] > 0.5 and c[0] > c[1]


def test_background_fill(rendered):
    """Pixels far from all gaussians = bg (zeros here)."""
    img = np.asarray(rendered["image"])
    corner = img[0, 0, :, 0, 0]
    np.testing.assert_allclose(corner, 0.0, atol=1e-3)


def test_opacity_zero_renders_background():
    cams = prepare_gs_training(orbit_c2w_opengl(2, elevation=0, camera_distance=2.0),
                               GSCameraSettings(), ray_size=8)
    g = np.stack([_gauss([0, 0, 0], opacity=0.0)])[None]
    out = jax.jit(
        lambda g: render_gaussians(
            jnp.asarray(g), jnp.asarray(cams["cam_view"][:, :1]),
            jnp.asarray(cams["cam_view_proj"][:, :1]),
            bg_color=jnp.full((3,), 0.25), img_size=32, backend="dense",
        )
    )(g)
    np.testing.assert_allclose(np.asarray(out["image"]), 0.25, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]), 0.0, atol=1e-5)


def test_depth_ordering_occlusion():
    """A red Gaussian in front of a green one (along view 0's axis) must
    dominate the center pixel; swapping order of the input array must not
    change the result (depth sort, not input order)."""
    cams = prepare_gs_training(orbit_c2w_opengl(1, elevation=0, camera_distance=2.0),
                               GSCameraSettings(), ray_size=8)
    # canonical frame: camera at (0,0,2) looking at origin → +z is closer
    front = _gauss([0, 0, 0.3], rgb=(1, 0, 0), opacity=0.99, scale=0.05)
    back = _gauss([0, 0, -0.3], rgb=(0, 1, 0), opacity=0.99, scale=0.05)

    render = jax.jit(
        lambda g: render_gaussians(
            g, jnp.asarray(cams["cam_view"]), jnp.asarray(cams["cam_view_proj"]),
            bg_color=jnp.zeros(3), img_size=32, backend="dense",
        )["image"]
    )
    img1 = np.asarray(render(jnp.asarray(np.stack([front, back]))[None]))
    img2 = np.asarray(render(jnp.asarray(np.stack([back, front]))[None]))
    np.testing.assert_allclose(img1, img2, atol=1e-5)
    c = img1[0, 0, :, 16, 16]
    assert c[0] > 3 * c[1], f"front gaussian should occlude: {c}"


def test_gradients_flow():
    """d(render)/d(gaussians) exists and is finite — the renderer sits inside
    the training loss (LGM) and the refine path."""
    cams = prepare_gs_training(orbit_c2w_opengl(1, elevation=0, camera_distance=2.0),
                               GSCameraSettings(), ray_size=8)
    g = jnp.asarray(np.stack([_gauss([0, 0, 0], opacity=0.8, scale=0.1)])[None])

    def loss(g):
        out = render_gaussians(
            g, jnp.asarray(cams["cam_view"]), jnp.asarray(cams["cam_view_proj"]),
            bg_color=jnp.zeros(3), img_size=16, backend="dense",
        )
        return jnp.sum((out["image"] - 0.5) ** 2)

    grads = jax.jit(jax.grad(loss))(g)
    gn = np.asarray(grads)
    assert np.all(np.isfinite(gn))
    assert np.abs(gn).max() > 0, "gradient should be nonzero"
    # position gradient specifically (the hard one for rasterizers)
    assert np.abs(gn[0, 0, :3]).max() > 0


def test_render_depth_monotonic_with_distance():
    """Depth output: a gaussian pushed farther from the camera must composite
    a larger depth (reference ashawkey-fork depth channel, core/gs.py:74)."""
    import numpy as np
    from videomv_tpu.data.cameras import GSCameraSettings, orbit_c2w_opengl, prepare_gs_training

    st = GSCameraSettings(input_size=32, output_size=32)
    cams = prepare_gs_training(orbit_c2w_opengl(1, 0.0, 1.5), st, ray_size=16)
    cv = jnp.asarray(cams["cam_view"][:, :1])
    cvp = jnp.asarray(cams["cam_view_proj"][:, :1])

    def scene(z):
        g = np.zeros((1, 1, 14), np.float32)
        g[0, 0, 0:3] = [0, 0, z]
        g[0, 0, 3] = 0.95          # opacity
        g[0, 0, 4:7] = 0.2         # scale
        g[0, 0, 7] = 1.0           # identity quat
        g[0, 0, 11:14] = 0.8
        return jnp.asarray(g)

    out_near = render_gaussians(scene(0.4), cv, cvp, img_size=32, backend="dense")
    out_far = render_gaussians(scene(-0.4), cv, cvp, img_size=32, backend="dense")
    c = 16
    d_near = float(out_near["depth"][0, 0, 0, c, c])
    d_far = float(out_far["depth"][0, 0, 0, c, c])
    a_near = float(out_near["alpha"][0, 0, 0, c, c])
    assert a_near > 0.5
    assert d_far > d_near > 0.0


def test_ply_roundtrip():
    """save_ply → load_ply reproduces the (pruned) gaussians exactly
    (reference core/gs.py:97-185 activation (de)compaction)."""
    import numpy as np
    import tempfile, os
    from videomv_tpu.ops.ply_io import load_ply, save_ply

    rs = np.random.default_rng(0)
    n = 64
    g = np.zeros((1, n, 14), np.float32)
    g[0, :, 0:3] = rs.uniform(-1, 1, (n, 3))
    g[0, :, 3] = rs.uniform(0.0, 1.0, n)           # some below the 0.005 prune
    g[0, :, 4:7] = rs.uniform(0.01, 0.2, (n, 3))
    quat = rs.normal(size=(n, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    g[0, :, 7:11] = quat
    g[0, :, 11:14] = rs.uniform(0, 1, (n, 3))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "g.ply")
        kept = save_ply(g, path)
        back = load_ply(path)

    mask = g[0, :, 3] >= 0.005
    assert kept == int(mask.sum()) == back.shape[1]
    np.testing.assert_allclose(back[0], g[0][mask], rtol=1e-4, atol=1e-5)
