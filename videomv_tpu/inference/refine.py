"""The 3D-aware refinement path: LGM reconstruction + splat re-render inside
the DDIM loop.

Reproduces the reference refine branch (unet_t2v.py:401-433 via
diffusion_ddim.py:256-259): at selected DDIM steps the denoiser's eps is
converted to a fake x0, four canonical views {0,6,12,18} are VAE-decoded,
the LGM reconstructs a Gaussian-splat scene from those views + Plücker rays,
ALL views are re-rendered, re-encoded, and the resulting latents substitute
for x0 in the DDIM update — pulling the whole trajectory toward an exactly
3D-consistent state.

TPU-native design: the entire branch is a pure function compiled inside the
sampling scan (lax.cond); cond and uncond CFG rows batch through the
VAE/LGM/renderer together.  The deterministic VAE-posterior mode replaces
the reference's posterior sample (autoencoder.py:86-91) so the scan stays
rng-free in this branch; the difference is sub-noise-floor at the refine
steps.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import GSCameraSettings
from ..ops.gaussian_splat import render_gaussians, render_gaussians_view_sharded

# imagenet normalization used for the LGM input (reference unet_t2v.py:383-385)
_VID_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_VID_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

REFINE_VIEW_IDXS = (0, 6, 12, 18)  # reference unet_t2v.py:407


def make_refine_fn(
    *,
    unet,
    vae,
    lgm,
    params: Dict[str, Any],
    diffusion,
    scale_factor: float,
    batch: int,
    gs_settings: GSCameraSettings,
    y=None,
    zero_y=None,
    cam=None,
    gs_rays=None,
    cam_view=None,
    cam_view_proj=None,
    splat_backend: str = "auto",
    uncond_mode: str = "full",
    view_idxs: tuple = REFINE_VIEW_IDXS,
    view_mesh=None,
    view_mesh_axis: str = "sp",
    view_mesh_dim: str = "view",
) -> Callable:
    """Build ``refine_fn(xt, t) -> (cond_latent_x0, uncond_latent_x0)``.

    gs_rays: [1, V, 6, S, S] Plücker embeddings; cam_view/cam_view_proj:
    [1, V, 4, 4] splat camera matrices (from prepare_gs_cameras).

    ``uncond_mode``:
      - ``"full"`` (default, reference parity): BOTH CFG rows run the whole
        refine branch — the reference calls the model separately for
        cond/uncond kwargs with ``autoencoder`` passed both times
        (diffusion_ddim.py:148-155), so the uncond row gets its own LGM
        reconstruction and renders, and the DDIM update extrapolates
        between the two refined latents with guide_scale.
      - ``"shared"`` (fast serving mode, NOT reference semantics): only the
        cond row runs the refine; the uncond row reuses its latents, which
        collapses the CFG lerp to the cond refine. Halves the refine-step
        cost (1 UNet row, 4 decodes, 1 LGM scene, V renders, V encodes).
        Opt-in via config ``gs_refine_uncond: shared``.

    ``view_mesh``: serving mesh. When set, the splat render runs sharded
    via ``shard_map`` — over the VIEW axis for frame-parallel serving
    (``view_mesh_dim='view'``, scene replicated, each device rasterizes
    its local V/n views) or over the BATCH axis for dp-batched serving
    (``view_mesh_dim='batch'``, each device renders its local scenes) —
    because the Pallas rasterizer is a custom call GSPMD cannot partition
    on its own. ``view_mesh_axis`` names the mesh axis ('sp' or 'dp').
    """
    idxs = jnp.asarray(view_idxs, dtype=jnp.int32)
    in_size = gs_settings.input_size
    out_size = gs_settings.output_size
    vid_mean = jnp.asarray(_VID_MEAN).reshape(1, 1, 3, 1, 1)
    vid_std = jnp.asarray(_VID_STD).reshape(1, 1, 3, 1, 1)

    shared = uncond_mode == "shared"
    if uncond_mode not in ("full", "shared"):
        raise ValueError(f"uncond_mode must be 'full' or 'shared', got {uncond_mode!r}")

    def refine_fn(xt, t):
        b = batch
        f = xt.shape[2]

        if shared:
            x2, t2, y2, c2 = xt, t, y, cam
        else:
            # both CFG rows through the UNet in one batch
            x2 = jnp.concatenate([xt, xt], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            y2 = jnp.concatenate([y, zero_y], axis=0)
            c2 = jnp.concatenate([cam, cam], axis=0)
        eps = unet.apply(params["unet"], x2, t2, y=y2, camera_data=c2)

        # eps → fake x0 (same algebra as the reference _i() lines,
        # unet_t2v.py:371 — note xt is reused for both rows)
        fake_x0 = diffusion.pred_to_x0(eps, x2, t2)

        # decode the 4 canonical views (both rows: batch 2b*4)
        dec = jnp.take(fake_x0, idxs, axis=2)  # [2b, 4ch, 4, h, w]
        b2 = dec.shape[0]
        dec = dec.transpose(0, 2, 1, 3, 4).reshape(b2 * 4, 4, dec.shape[-2], dec.shape[-1])
        dec = dec / scale_factor
        imgs = vae.apply(params["vae"], dec, method=vae.decode)  # [2b*4, 3, H, W]
        imgs = imgs.reshape(b2, 4, 3, imgs.shape[-2], imgs.shape[-1])
        imgs = jnp.clip(imgs * 0.5 + 0.5, 0.0, 1.0)
        imgs = (imgs - vid_mean) / vid_std

        # LGM input: [2b, 4, 9, S, S]
        rays = jnp.take(gs_rays, idxs, axis=1)  # [1, 4, 6, S, S]
        rays2 = jnp.broadcast_to(rays, (b2,) + rays.shape[1:])
        lgm_in = jnp.concatenate([imgs, rays2], axis=2)
        gaussians = lgm.apply(params["lgm"], lgm_in)  # [2b, N, 14]

        # re-render all views at the splat output size, bg 0.5
        cv = jnp.broadcast_to(cam_view, (b2,) + cam_view.shape[1:])
        cvp = jnp.broadcast_to(cam_view_proj, (b2,) + cam_view_proj.shape[1:])
        bg = jnp.full((3,), 0.5, jnp.float32)  # infer() bg_color_factor=0.5
        rkw = dict(bg_color=bg, img_size=out_size, fovy_deg=gs_settings.fovy,
                   backend=splat_backend, packed=True)
        if view_mesh is not None:
            out = render_gaussians_view_sharded(
                view_mesh, gaussians, cv, cvp,
                axis=view_mesh_axis, shard_dim=view_mesh_dim, **rkw,
            )
        else:
            out = render_gaussians(gaussians, cv, cvp, **rkw)
        renders = out["image"]  # [2b, V, 3, out, out]

        # downsample to the diffusion resolution, scale to [-1, 1], encode
        V = renders.shape[1]
        r = renders.reshape(b2 * V, 3, out_size, out_size)
        if out_size != in_size:
            r = jax.image.resize(r, (b2 * V, 3, in_size, in_size), method="nearest")
        r = (r - 0.5) / 0.5
        z = vae.apply(
            params["vae"], r, scale_factor, method=vae.encode_first_stage
        )  # [2b*V, 4, h, w]
        z = z.reshape(b2, V, 4, z.shape[-2], z.shape[-1]).transpose(0, 2, 1, 3, 4)

        if shared:
            return z, z
        return z[:b], z[b:]

    return refine_fn
