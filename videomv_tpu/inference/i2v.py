"""Image→multiview inference pipeline (I2VGen-XL variant).

Parity with the reference engine
(/root/reference/tools/inferences/inference_i2vgen_entrance.py:65-349):
RGBA input composited on white-255, CLIP global image embedding + VAE
reference-frame latent conditioning, empty text prompt, zero image feature
for the unconditional CFG row (``use_zero_infer``,
inference_i2vgen_entrance.py:128,268), cosine/zero-terminal-SNR v-pred
diffusion, guidance 6.0.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.samplers import ddim_sample_loop
from ..models.clip import VIT_MEAN, VIT_STD
from ..models.unet_i2v import UNetSD_I2VGen
from ..parallel.infer import replicate_params, shard_on_axis
from .pipeline import T2VPipeline, _kernel_trace_ctx, unet_kwargs_from_cfg

logger = logging.getLogger(__name__)


def load_white_composite(image_path: str, size: int = 256) -> np.ndarray:
    """RGBA file → white-255 composited float RGB [H, W, 3] in [0,1]
    (inference_i2vgen_entrance.py:231-241)."""
    from PIL import Image

    img = Image.open(image_path).convert("RGBA")
    bg = Image.new("RGB", img.size, (255, 255, 255))
    bg.paste(img, (0, 0), mask=img)
    bg = bg.resize((size, size), Image.BILINEAR)
    return np.asarray(bg).astype(np.float32) / 255.0


class I2VPipeline(T2VPipeline):
    """Image-conditioned multiview generation."""

    def __post_init__(self):
        super().__post_init__()
        self.unet = UNetSD_I2VGen(
            dtype=self.dtype, **unet_kwargs_from_cfg(self.cfg.get("UNet", {}))
        )
        self._encode_image_fn = None
        self._encode_latent_fn = None

    def init_params(self, rng: Optional[jax.Array] = None, load: bool = True):
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed)
        b, f = 1, self.max_frames
        h, w = self.latent_hw
        r1, r2, r3, r4 = jax.random.split(rng, 4)

        x = jnp.zeros((b, 4, f, h, w))
        t = jnp.zeros((b,), jnp.int32)
        y = jnp.zeros((b, 77, self.unet.context_dim))
        cam = jnp.zeros((b, f, 16))
        local = jnp.zeros((b, 4, 1, h, w))
        img_emb = jnp.zeros((b, self.unet.y_dim))
        self._params["unet"] = jax.jit(self.unet.init)(
            r1, x, t, y=y, camera_data=cam, local_image=local, image=img_emb
        )

        img = jnp.zeros((1, 3, self.resolution[1], self.resolution[0]))
        self._params["vae"] = jax.jit(self.vae.init)(r2, img)

        # full CLIP (text + visual towers)
        toks = jnp.zeros((1, 77), jnp.int32)
        vit_img = jnp.zeros((1, 3, 224, 224))
        self._params["clip"] = jax.jit(self.clip.init)(r3, toks, vit_img)

        if self.lgm is not None:
            lgm_in = jnp.zeros(
                (1, 4, 9, self.gs_settings.input_size, self.gs_settings.input_size)
            )
            self._params["lgm"] = jax.jit(self.lgm.init)(r4, lgm_in)

        # fresh params invalidate the mesh snapshots and CLIP-derived caches
        # (same contract as T2VPipeline.init_params)
        self._params_sp = None
        self._params_dp = None
        self._negative_cache.clear()

        if load:
            self.load_weights()
        else:
            self._cast_params_storage()
        return self._params

    # -------------------------------------------------------- conditioning

    def encode_image_clip(self, rgb: np.ndarray) -> jnp.ndarray:
        """float RGB [H,W,3] in [0,1] → CLIP image embedding [1, 1024]."""
        x = jnp.asarray(rgb)[None]  # [1, H, W, 3]
        x = jax.image.resize(x, (1, 224, 224, 3), method="bilinear")
        x = (x - jnp.asarray(VIT_MEAN)) / jnp.asarray(VIT_STD)
        x = x.transpose(0, 3, 1, 2)
        if self._encode_image_fn is None:
            self._encode_image_fn = jax.jit(
                lambda p, im: self.clip.apply(p, im, method=self.clip.encode_image)
            )
        return self._encode_image_fn(self._params["clip"], x)

    def encode_local_latent(self, rgb: np.ndarray) -> jnp.ndarray:
        """float RGB [H,W,3] → VAE latent [1, 4, 1, h, w] (scale-factored)."""
        x = jnp.asarray(rgb)[None].transpose(0, 3, 1, 2) * 2.0 - 1.0
        if self._encode_latent_fn is None:
            sf = self.scale_factor
            self._encode_latent_fn = jax.jit(
                lambda p, im: self.vae.apply(p, im, sf, method=self.vae.encode_first_stage)
            )
        z = self._encode_latent_fn(self._params["vae"], x)
        return z[:, :, None]  # [1, 4, 1, h, w]

    # ------------------------------------------------------------- sampler

    def _build_sampler_i2v(self, steps: int, guide_scale: float, with_refine: bool,
                           view_mesh=None):
        unet, vae, lgm = self.unet, self.vae, self.lgm
        b = 1
        sf = self.scale_factor
        diffusion = self.diffusion
        gs_settings = self.gs_settings

        @jax.jit
        def sample(params, noise, y, zero_y, cam, local, img_emb, zero_img,
                   gs_rays, cam_view, cam_view_proj, rng):
            def cfg_model(xt, t):
                x2 = jnp.concatenate([xt, xt], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                y2 = jnp.concatenate([y, zero_y], axis=0)
                c2 = jnp.concatenate([cam, cam], axis=0)
                l2 = jnp.concatenate([local, local], axis=0)
                i2 = jnp.concatenate([img_emb, zero_img], axis=0)
                out = unet.apply(
                    params["unet"], x2, t2, y=y2, camera_data=c2,
                    local_image=l2, image=i2,
                )
                return out[:b], out[b:]

            refine_fn = None
            if with_refine and lgm is not None:
                from .refine import REFINE_VIEW_IDXS, make_refine_fn

                # the refine path re-runs the I2V UNet with full conditioning;
                # size the image rows to the incoming batch — 2b rows in
                # 'full' uncond mode ([cond; uncond]), b rows in 'shared'
                # (cond only, so real image conditioning, no zero rows)
                def unet_apply(p, x2, t2, **kw):
                    if x2.shape[0] == b:
                        l2, i2 = local, img_emb
                    else:
                        l2 = jnp.concatenate([local, local], axis=0)
                        i2 = jnp.concatenate([img_emb, zero_img], axis=0)
                    return unet.apply(p, x2, t2, local_image=l2, image=i2, **kw)

                class _UnetShim:
                    apply = staticmethod(unet_apply)

                refine_fn = make_refine_fn(
                    unet=_UnetShim, vae=vae, lgm=lgm, params=params,
                    diffusion=diffusion, scale_factor=sf, batch=b,
                    gs_settings=gs_settings,
                    y=y, zero_y=zero_y, cam=cam, gs_rays=gs_rays,
                    cam_view=cam_view, cam_view_proj=cam_view_proj,
                    uncond_mode=str(self.cfg.get("gs_refine_uncond", "full")),
                    view_idxs=tuple(self.cfg.get("gs_refine_views", REFINE_VIEW_IDXS)),
                    view_mesh=view_mesh,
                )
            return ddim_sample_loop(
                diffusion, cfg_model, noise,
                ddim_timesteps=steps, eta=0.0, guide_scale=guide_scale,
                refine_fn=refine_fn,
                refine_steps=tuple(self.cfg.get("gs_refine_steps", (20, 30, 40))),
                rng=rng,
            )

        return sample

    # ------------------------------------------------------------ generate

    def generate_from_image(
        self,
        image_path: str,
        steps: int = 50,
        guide_scale: Optional[float] = None,
        use_gs_refine: bool = False,
        seed: Optional[int] = None,
        elevation: float = 15.0,
        camera_distance: float = 2.0,
        frame_parallel: bool = False,
    ) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        guide_scale = guide_scale if guide_scale is not None else float(cfg.get("guide_scale", 6.0))
        seed = seed if seed is not None else int(cfg.get("seed", 0))

        rgb = load_white_composite(image_path, self.resolution[0])
        y_words = self.encode_text([""])
        neg_prompt = cfg.get("negative_prompt", "")
        neg = self._negative_cache.get(neg_prompt)
        if neg is None:
            neg = self.encode_text([neg_prompt])
            self._negative_cache[neg_prompt] = neg
        y_visual = self.encode_image_clip(rgb)  # [1, 1024]
        zero_img = jnp.zeros_like(y_visual) if bool(cfg.get("use_zero_infer", True)) else y_visual
        local = jnp.repeat(self.encode_local_latent(rgb), 1, axis=2)

        # orbit conditioning + splat cameras, cached per orbit on host math
        # and device arrays (T2VPipeline._get_cameras)
        cam, gs_rays, gs_cv, gs_cvp = self._get_cameras(elevation, camera_distance)

        rng = jax.random.PRNGKey(seed)
        noise_rng, sample_rng = jax.random.split(rng)
        h, w = self.latent_hw
        noise = jax.random.normal(noise_rng, (1, 4, self.max_frames, h, w))

        # frame-sharded (sequence-parallel) serving — same placement scheme
        # as T2VPipeline.generate; see videomv_tpu/parallel/infer.py
        params = self._params
        sp = None
        if frame_parallel:
            sp = self._serving_mesh()
            if sp is not None:
                if self._params_sp is None:
                    self._params_sp = self._place_params_serving(sp)
                params = self._params_sp
                cam, gs_rays, gs_cv, gs_cvp = self._sp_place_orbit(
                    sp, elevation, camera_distance)
                noise = shard_on_axis(sp, noise, 2)
                # per-image conditioning is tiny — replicate fresh per call
                (y_words, neg, local, y_visual, zero_img,
                 sample_rng) = replicate_params(
                    sp, (y_words, neg, local, y_visual, zero_img, sample_rng))

        key = ("i2v", steps, guide_scale, use_gs_refine, sp is not None)
        if key not in self._samplers:
            self._samplers[key] = self._build_sampler_i2v(
                steps, guide_scale, use_gs_refine,
                view_mesh=sp if use_gs_refine else None)

        with _kernel_trace_ctx(sp, "frame"):
            latents = self._samplers[key](
                params, noise, y_words, neg, cam, local, y_visual, zero_img,
                gs_rays, gs_cv, gs_cvp, sample_rng,
            )
        frames = self._decode_latents(latents)
        frames_np = np.asarray(frames[0])
        return {"frames": frames_np, "latents": np.asarray(latents)}
