"""Training engine: text→multiview finetuning (train_t2v_entrance parity).

Replaces the reference train engine
(/root/reference/tools/train/train_t2v_enterance.py:36-419) with a
single-process GSPMD loop:

  reference                          → here
  mp.spawn + DDP/NCCL                → jax mesh, sharded batch, psum grads
  AMP GradScaler                     → bf16 compute, fp32 master params
  per-rank heterogeneous frame_lens  → homogeneous-step schedule (see
                                       ``image_video_interleave``; per-rank
                                       divergent shapes are SPMD-hostile by
                                       design — SURVEY.md §2)
  sharded EMA dict (k[rank::ws])     → replicated EMA pytree (orbax saves
                                       one logical tree)
  torch .pth checkpoints             → orbax checkpoints + torch import

The frozen VAE/CLIP encode runs jitted on-device before the train step;
classifier-free dropout (p_zero) happens inside the step.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AttrDict
from ..data.datasets import (
    GObjaverseVideoDataset,
    SyntheticMVDataset,
    batch_iterator,
    cycle_epochs,
    prefetch_host,
)
from ..data.tokenizer import tokenize
from ..diffusion import GaussianDiffusion
from ..models.autoencoder import AutoencoderKL
from ..models.clip import OpenCLIPTextVisual
from ..models.unet_i2v import UNetSD_I2VGen
from ..models.unet_t2v import UNetSD_T2VBase
from ..parallel import (
    TrainState, build_train_step, make_i2v_apply, make_mesh, make_t2v_apply,
    replicate, shard_batch,
)
from jax.sharding import NamedSharding, PartitionSpec as P
from ..inference.pipeline import unet_kwargs_from_cfg
from .optim import build_optimizer

logger = logging.getLogger(__name__)


class T2VTrainer:
    """Builds all towers and drives the training loop."""

    def __init__(self, cfg: AttrDict, dtype: Any = jnp.bfloat16):
        self.cfg = cfg
        self.dtype = dtype
        d = dict(cfg.get("Diffusion", {}))
        d.pop("type", None)
        d.pop("ddim_timesteps", None)
        self.diffusion = GaussianDiffusion(**d)
        self.is_i2v = cfg.get("TASK_TYPE", "") == "train_i2v_entrance" or \
            cfg.get("UNet", {}).get("type") == "UNetSD_I2VGen"
        unet_cls = UNetSD_I2VGen if self.is_i2v else UNetSD_T2VBase
        self.unet = unet_cls(dtype=dtype, **unet_kwargs_from_cfg(cfg.get("UNet", {})))
        self.vae = AutoencoderKL(dtype=dtype)
        self.clip = OpenCLIPTextVisual(dtype=dtype)

        self.max_frames = int(cfg.get("frame_lens", [24])[0])
        self.resolution = list(cfg.get("resolution", [256, 256]))
        self.scale_factor = float(cfg.get("scale_factor", 0.18215))
        self.use_lgm_refine = bool(cfg.get("UNet", {}).get("use_lgm_refine", False))
        # dp_devices limits the data mesh (batch must divide it); default all
        n_dp = cfg.get("dp_devices")
        self.mesh = make_mesh(int(n_dp) if n_dp else None)

        self.params: Dict[str, Any] = {}
        self.state: Optional[TrainState] = None
        self._encode_batch = None
        self._encode_image = None
        self._i2v_viz_fn = None

    # ------------------------------------------------------------- setup

    def init(self, rng: Optional[jax.Array] = None):
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(int(cfg.get("seed", 0)))
        r1, r2, r3 = jax.random.split(rng, 3)
        b, f = 1, self.max_frames
        h = self.resolution[1] // 8
        w = self.resolution[0] // 8

        x = jnp.zeros((b, 4, f, h, w))
        t = jnp.zeros((b,), jnp.int32)
        y = jnp.zeros((b, 77, self.unet.context_dim))
        cam = jnp.zeros((b, f, 16))
        if self.is_i2v:
            local = jnp.zeros((b, 4, 1, h, w))
            img_emb = jnp.zeros((b, self.unet.y_dim))
            unet_params = jax.jit(self.unet.init)(
                r1, x, t, y=y, camera_data=cam, local_image=local, image=img_emb
            )
        else:
            unet_params = jax.jit(self.unet.init)(r1, x, t, y=y, camera_data=cam)

        img = jnp.zeros((1, 3, self.resolution[1], self.resolution[0]))
        self.params["vae"] = jax.jit(self.vae.init)(r2, img)
        toks = jnp.zeros((1, 77), jnp.int32)
        import functools

        if self.is_i2v:
            vit_img = jnp.zeros((1, 3, 224, 224))
            self.params["clip"] = jax.jit(self.clip.init)(r3, toks, vit_img)
        else:
            self.params["clip"] = jax.jit(
                functools.partial(self.clip.init, method=self.clip.encode_text)
            )(r3, toks)

        # tolerant pretrain load (reference Pretrain strategy)
        pre = cfg.get("Pretrain", {})
        ckpt = pre.get("resume_checkpoint")
        self.resume_step = 0
        if ckpt and os.path.exists(ckpt):
            from .checkpoints import convert_unet, load_torch_checkpoint

            sd = load_torch_checkpoint(ckpt)
            unet_params, report = convert_unet(sd, unet_params)
            logger.info(
                "pretrain load %s: %d matched / %d missing / %d unexpected",
                ckpt, len(report["matched"]), len(report["missing"]),
                len(report["unexpected"]),
            )
            import re as _re

            m = _re.search(r"(\d+)\.pth", os.path.basename(ckpt))
            if m:
                self.resume_step = int(m.group(1))

        if self.use_lgm_refine:
            # LGM-only finetune: freeze the whole denoiser/VAE, train the LGM
            # through re-rendered-view supervision (reference
            # train_i2v_enterance.py:154-165)
            self._init_lgm_refine(cfg, unet_params)
            return self

        self.optimizer = build_optimizer(
            lr=float(cfg.get("lr", 3e-5)),
            weight_decay=float(cfg.get("weight_decay", 0.0)),
            warmup_steps=int(cfg.get("warmup_steps", 10)),
            total_steps=int(cfg.get("num_steps", 1_000_000)),
            decay_mode=str(cfg.get("decay_mode", "cosine")),
            # fix_weight freezes the SD-origin keys entirely (reference
            # pretrain_functions.py:46-48: requires_grad=False) — expressed
            # as grad scale 0 over the same key set
            grad_scale=(0.0 if cfg.get("Pretrain", {}).get("fix_weight")
                        else cfg.get("Pretrain", {}).get("grad_scale")),
            sd_keys_path=cfg.get("Pretrain", {}).get("sd_keys_path"),
            optimizer=str(cfg.get("optimizer", "adamw")),
        )
        opt_state = jax.jit(self.optimizer.init)(unet_params)
        use_ema = bool(cfg.get("use_ema", False))
        ema0 = (
            jax.tree_util.tree_map(lambda x: x + 0.0, unet_params) if use_ema else None
        )
        # param placement: replicated (default) or ZeRO-style fully-sharded
        # over the dp axis (cfg param_sharding: fsdp) — lets AdamW + fp32
        # master params fit where per-chip HBM can't hold the whole state
        state_shardings = None
        if str(cfg.get("param_sharding", "replicated")) == "fsdp":
            from ..parallel import fsdp_shardings

            place = lambda tree: jax.tree_util.tree_map(  # noqa: E731
                jax.device_put, tree, fsdp_shardings(tree, self.mesh))
            # step must be mesh-placed like every other leaf: a raw
            # single-device scalar's aval lacks the mesh annotation the
            # jitted step's OUTPUT step carries, so feeding the state back
            # would retrace + recompile the whole program (the "second
            # tunnel compile" of PERF.md roadmap #7 — root-caused with
            # jax_explain_cache_misses: `at state.step, now
            # i32[]({Auto: ('dp',)}) and before i32[]({})`).
            self.state = TrainState(
                step=replicate(self.mesh, jnp.asarray(self.resume_step, jnp.int32)),
                params=place(unet_params),
                opt_state=place(opt_state),
                ema_params=place(ema0) if use_ema else None,
            )
            repl_sh = NamedSharding(self.mesh, P())
            state_shardings = TrainState(
                step=repl_sh,
                params=fsdp_shardings(unet_params, self.mesh),
                opt_state=fsdp_shardings(opt_state, self.mesh),
                ema_params=fsdp_shardings(ema0, self.mesh) if use_ema else None,
            )
            self._state_shardings = state_shardings
        else:
            self.state = TrainState(
                step=replicate(self.mesh, jnp.asarray(self.resume_step, jnp.int32)),
                params=replicate(self.mesh, unet_params),
                opt_state=replicate(self.mesh, opt_state),
                ema_params=replicate(self.mesh, ema0) if use_ema else None,
            )
        apply_fn = make_i2v_apply(self.unet) if self.is_i2v else make_t2v_apply(self.unet)
        # dropped-row substitute = CLIP embedding of the negative prompt
        # (reference zero_y_negative, train_t2v_enterance.py:174,274)
        neg_toks = jnp.asarray(tokenize([str(cfg.get("negative_prompt", ""))]))
        zero_y = jax.jit(
            lambda p, tk: self.clip.apply(p, tk, method=self.clip.encode_text)[1]
        )(self.params["clip"], neg_toks)
        self.zero_y = zero_y
        self.train_step = build_train_step(
            apply_fn, self.diffusion, self.optimizer, self.mesh,
            ema_decay=float(cfg.get("ema_decay", 0.9999)),
            use_ema=use_ema,
            p_zero=float(cfg.get("p_zero", 0.1)),
            zero_y=zero_y,
            state_shardings=state_shardings,
            prng_impl=cfg.get("prng_impl") or None,
        )
        return self

    def _init_lgm_refine(self, cfg: AttrDict, unet_params):
        """LGM-only finetune mode (cfg.UNet.use_lgm_refine): the reference
        freezes every non-``lgm_big`` parameter (train_i2v_enterance.py:162-165)
        and trains the LGM with MSE + λ·LPIPS supervision on re-rendered
        views (core/models.py:167-184). Here the LGM tree is simply the only
        optimized tree; UNet/VAE/LPIPS ride along frozen."""
        from ..models.lgm import LGM, LGMOptions
        from ..models.lpips import LPIPS, convert_lpips
        from .lgm_refine import LGMTrainState, build_lgm_refine_step

        preset = cfg.get("lgm_opts", "big")
        if isinstance(preset, str):
            opts = getattr(LGMOptions, preset)()
        else:  # dict of LGMOptions kwargs (tiny test configs)
            kw = {k: tuple(v) if isinstance(v, list) else v for k, v in dict(preset).items()}
            opts = LGMOptions(**kw)
        # Memory levers for the reference-scale 512² refine finetune
        # (core/options.py:92-103): per-block LGM remat + chunked
        # supervision rendering default ON at output_size≥512 — without
        # both, the step's temp footprint alone is ~7.4 GiB and the v5e
        # OOMs (PERF.md round 4, probe_lgm512_mem).
        big_render = int(opts.output_size) >= 512
        lgm_remat = bool(cfg.get("lgm_use_checkpoint", big_render))
        view_chunk = int(cfg.get("refine_view_chunk", 2 if big_render else 0))
        self.lgm = LGM(opt=opts, dtype=self.dtype, use_checkpoint=lgm_remat)
        s = opts.input_size
        lgm_in = jnp.zeros((1, opts.num_input_views, 9, s, s))
        lgm_params = jax.jit(self.lgm.init)(jax.random.PRNGKey(7), lgm_in)
        lp = cfg.get("lgm_pretrain")
        if lp and os.path.exists(lp):
            from .checkpoints import convert_lgm, load_torch_checkpoint

            lgm_params, rep = convert_lgm(load_torch_checkpoint(lp), lgm_params)
            logger.info(
                "lgm pretrain %s: %d matched / %d missing", lp,
                len(rep["matched"]), len(rep["missing"]),
            )

        self.lpips = LPIPS()
        probe = jnp.zeros((1, 3, 32, 32))
        lpips_params = jax.jit(self.lpips.init)(jax.random.PRNGKey(8), probe, probe)
        lpp = cfg.get("lpips_pretrain")
        if lpp and os.path.exists(lpp):
            from .checkpoints import load_torch_checkpoint

            lpips_params, _ = convert_lpips(load_torch_checkpoint(lpp), lpips_params)

        self.optimizer = build_optimizer(
            lr=float(cfg.get("lr", 3e-5)),
            weight_decay=float(cfg.get("weight_decay", 0.0)),
            warmup_steps=int(cfg.get("warmup_steps", 10)),
            total_steps=int(cfg.get("num_steps", 1_000_000)),
            decay_mode=str(cfg.get("decay_mode", "cosine")),
            optimizer=str(cfg.get("optimizer", "adamw")),
        )
        self.lgm_state = LGMTrainState(
            # replicate() the step scalar too — a raw scalar retraces the
            # donated-state step on call 2 (see the TrainState comment)
            step=replicate(self.mesh, jnp.asarray(self.resume_step, jnp.int32)),
            lgm_params=replicate(self.mesh, lgm_params),
            opt_state=replicate(self.mesh, jax.jit(self.optimizer.init)(lgm_params)),
        )
        # Frozen-tree storage dtype. The UNet/VAE/LPIPS trees take no
        # gradient (reference freeze, train_i2v_enterance.py:162-165) and
        # every compute path casts weights to the module dtype in-program,
        # so when compute is bf16, bf16 STORAGE is numerically identical
        # (same round-to-nearest cast) while halving ~6 GB of fp32
        # residency — the margin that lets the 512² 'big'-LGM refine smoke
        # fit the 16 GB v5e (PERF.md round 4). `frozen_dtype: float32`
        # opts out (and is the default under fp32 compute).
        fd = str(cfg.get(
            "frozen_dtype",
            "bfloat16" if self.dtype == jnp.bfloat16 else "float32")).lower()
        if fd in ("bfloat16", "bf16") and self.dtype == jnp.bfloat16:
            def _cast(tree):
                return jax.tree_util.tree_map(
                    lambda l: l.astype(jnp.bfloat16)
                    if hasattr(l, "dtype") and l.dtype == jnp.float32 else l,
                    tree)
        else:
            def _cast(tree):
                return tree
        self.frozen = (
            replicate(self.mesh, _cast(unet_params)),
            replicate(self.mesh, _cast(self.params["vae"])),
            replicate(self.mesh, _cast(lpips_params)),
        )
        apply_fn = make_i2v_apply(self.unet) if self.is_i2v else make_t2v_apply(self.unet)
        self.refine_step = build_lgm_refine_step(
            apply_fn, self.vae, self.lgm, self.diffusion, self.optimizer,
            self.mesh, scale_factor=self.scale_factor,
            n_input_views=int(opts.num_input_views),
            n_supervise_extra=max(int(opts.num_views) - int(opts.num_input_views), 0),
            render_size=int(opts.output_size), fovy_deg=float(opts.fovy),
            ray_size=int(opts.input_size),
            znear=float(opts.znear), zfar=float(opts.zfar),
            splat_backend=str(cfg.get("splat_backend", "auto")),
            lpips=self.lpips,
            lambda_lpips=float(cfg.get("lambda_lpips", opts.lambda_lpips)),
            view_chunk=view_chunk,
        )

    def _gs_features(self, host_batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """GS supervision block for the refine step.

        Default wire (``gs_wire_cameras: true``): ONLY the ground-truth
        views/masks cross host→device — as uint8 when ``wire_uint8`` is on
        (lossy but negligible: sources are 8-bit, but after the dataset's
        resize-to-gs_full_size + alpha compositing the frames/continuous
        masks are float, so quantizing re-introduces ≤1/510 per-pixel
        error; set ``wire_uint8: false`` for a bit-exact fp32 wire) — and
        the refine step derives rays + colmap matrices in-program from
        ``camera_data``
        (ops/gs_cameras.py). At bs=1/f=24/512² that cuts the per-step
        upload from ~163 MB to ~25 MB. ``gs_wire_cameras: false`` restores
        the host-side camera prep (dataset gs_data, or derived from
        ``camera_data`` for the synthetic smoke path)."""
        opts = self.lgm.opt
        wire_u8 = bool(self.cfg.get("wire_uint8", True))
        dev_cams = (
            bool(self.cfg.get("gs_wire_cameras", True))
            and "camera_data" in host_batch
        )
        host_cams = None
        if "gs_data" in host_batch:
            gs = host_batch["gs_data"]
            imgs, masks = gs["images_output"], gs["masks_output"]
            if not dev_cams and "input" in gs:
                host_cams = (gs["input"], gs["cam_view"], gs["cam_view_proj"])
        else:
            imgs = np.asarray(host_batch["video"]) * 0.5 + 0.5
            masks = np.asarray(
                host_batch.get("mask", np.ones_like(imgs[:, :, :1]))
            )
        if not dev_cams and host_cams is None:
            # host camera chain, derived from the conditioning tensor (same
            # LGMOptions geometry the device derivation uses, so the two
            # wire modes cannot silently diverge — advisor r4)
            from ..data.cameras import GSCameraSettings, prepare_gs_training

            st = GSCameraSettings(
                input_size=opts.input_size, output_size=opts.output_size,
                fovy=opts.fovy, znear=opts.znear, zfar=opts.zfar,
            )
            cams = np.asarray(host_batch["camera_data"])
            per = [
                prepare_gs_training(cams[i][None], st, ray_size=opts.input_size)
                for i in range(cams.shape[0])
            ]  # canonicalization is per-item (pose 0 of each sample)
            host_cams = (
                np.concatenate([g["input_rays"] for g in per]),
                np.concatenate([g["cam_view"] for g in per]),
                np.concatenate([g["cam_view_proj"] for g in per]),
            )
        imgs, masks = np.asarray(imgs), np.asarray(masks)
        if wire_u8 and imgs.dtype != np.uint8:
            imgs = np.clip(imgs * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
            masks = np.clip(masks * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
        imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)
        r = int(opts.output_size)
        if imgs.shape[-1] != r:
            if imgs.dtype == jnp.uint8:  # resize in float; wire stays uint8
                imgs = imgs.astype(jnp.float32) / 255.0
                masks = masks.astype(jnp.float32) / 255.0
            b, f = imgs.shape[:2]
            imgs = jax.image.resize(imgs, (b, f, 3, r, r), method="bilinear")
            masks = jax.image.resize(masks, (b, f, 1, r, r), method="bilinear")
        out = {"images_gt": imgs, "masks_gt": masks}
        if host_cams is not None:
            out.update({
                "gs_rays": jnp.asarray(host_cams[0]),
                "cam_view": jnp.asarray(host_cams[1]),
                "cam_view_proj": jnp.asarray(host_cams[2]),
            })
        return out

    # -------------------------------------------------------------- data

    def make_dataset(self):
        cfg = self.cfg
        vd = cfg.get("vid_dataset", {})
        lists = [p for p in vd.get("data_list", []) if os.path.exists(p)]
        if lists:
            from ..data.datasets import GObjaverseI2VDataset

            ds_cls = GObjaverseI2VDataset if self.is_i2v else GObjaverseVideoDataset
            extra = {}
            lgm = getattr(self, "lgm", None)
            if lgm is not None:
                # one geometry source of truth: dataset GT prep and the
                # device-side camera derivation both read LGMOptions
                # (advisor r4: a config that diverged them was silent)
                from ..data.cameras import GSCameraSettings

                o = lgm.opt
                extra["gs_settings"] = GSCameraSettings(
                    fovy=float(o.fovy), znear=float(o.znear),
                    zfar=float(o.zfar), input_size=int(o.input_size),
                    output_size=int(o.output_size),
                )
            ds = ds_cls(
                data_list=vd.get("data_list", []),
                data_dir_list=vd.get("data_dir_list", []),
                caption_dir=vd.get("caption_dir"),
                resolution=tuple(vd.get("resolution", self.resolution)),
                max_frames=self.max_frames,
                prepare_lgm=bool(vd.get("prepare_lgm", False)),
                # skip the dead host camera chain when the device wire is on
                prepare_gs_cameras=not bool(self.cfg.get("gs_wire_cameras", True)),
                **extra,
            )
            if len(ds.items) > 0:
                return ds
        logger.warning("no dataset assets found; using SyntheticMVDataset")
        return SyntheticMVDataset(
            resolution=tuple(self.resolution), max_frames=self.max_frames
        )

    def make_image_dataset(self):
        """Optional LAION image stream for joint training
        (configs/t2v_train_laion.yaml; reference heterogeneous frame_lens
        recast as alternating shape-uniform steps)."""
        cfg = self.cfg
        idc = cfg.get("img_dataset", {})
        if idc.get("type") != "LAIONImageDataset":
            return None
        from ..data.laion import LaionImageDataset, expand_shard_spec

        shard_specs = idc.get("shards", [])
        shards = []
        for spec in shard_specs:
            found = expand_shard_spec(spec)
            if not found:
                logger.warning("img_dataset shard spec %r matched no files", spec)
            shards.extend(found)
        if not shards:
            return None
        # image steps run at f=1 (a separate jit specialization of the same
        # train step) — matching the reference's f=1 image ranks without
        # per-device shape divergence
        return LaionImageDataset(
            shards=shards,
            resolution=tuple(idc.get("resolution", self.resolution)),
            max_frames=1,
        )

    def encode_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        """Host batch → device features: frozen VAE encode + CLIP text.

        The video crosses host→device as uint8 (4× fewer bytes than fp32 —
        the raw bs=2×24-frame 256² batch is 9.4 MB instead of 37.7 MB, and
        through the tunneled chip the upload is the dominant per-step host
        cost) and is normalized back to [-1, 1] on device. Sources are
        8-bit images, so the round-trip is exact; ``wire_uint8: false``
        restores the fp32 path."""
        wire_u8 = bool(self.cfg.get("wire_uint8", True))
        if self._encode_batch is None:
            vae, clip, sf = self.vae, self.clip, self.scale_factor

            @jax.jit
            def encode(vae_params, clip_params, video, toks):
                if video.dtype == jnp.uint8:
                    video = video.astype(jnp.float32) / 127.5 - 1.0
                b, f, c, hh, ww = video.shape
                flat = video.reshape(b * f, c, hh, ww)
                z = vae.apply(vae_params, flat, sf, method=vae.encode_first_stage)
                z = z.reshape(b, f, 4, z.shape[-2], z.shape[-1]).transpose(0, 2, 1, 3, 4)
                y = clip.apply(clip_params, toks, method=clip.encode_text)[1]
                return z, y

            self._encode_batch = encode

        video = np.asarray(batch["video"])
        if wire_u8 and video.dtype != np.uint8:
            video = np.clip((video + 1.0) * 127.5 + 0.5, 0.0, 255.0).astype(np.uint8)
        toks = jnp.asarray(tokenize(list(batch["caption"])))
        z, y = self._encode_batch(
            self.params["vae"], self.params["clip"],
            jnp.asarray(video), toks,
        )
        out = {"latents": z, "y_words": y}
        if "camera_data" in batch:
            out["camera_data"] = jnp.asarray(batch["camera_data"])
        if self.is_i2v:
            # reference-frame conditioning (train_i2v_enterance.py:236-238):
            # VAE latent of view 0 + CLIP image embedding of view 0
            ref = jnp.asarray(batch["video"])[:, 0]  # [B, 3, H, W]
            out["local_image"] = z[:, :, :1]
            if self._encode_image is None:
                from ..models.clip import VIT_MEAN, VIT_STD

                clip = self.clip

                @jax.jit
                def encode_image(clip_params, img):
                    x = jnp.clip(img * 0.5 + 0.5, 0, 1)
                    x = jax.image.resize(x, (x.shape[0], 3, 224, 224), method="bilinear")
                    x = (x - jnp.asarray(VIT_MEAN).reshape(1, 3, 1, 1)) / \
                        jnp.asarray(VIT_STD).reshape(1, 3, 1, 1)
                    return clip.apply(clip_params, x, method=clip.encode_image)

                self._encode_image = encode_image
            out["image_embed"] = self._encode_image(self.params["clip"], ref)
        return out

    # -------------------------------------------------------------- loop

    def train(self, num_steps: Optional[int] = None, batch_size: Optional[int] = None):
        cfg = self.cfg
        num_steps = num_steps or int(cfg.get("num_steps", 1000))
        bs = batch_size or int(
            cfg.get("batch_sizes", {}).get(str(self.max_frames), 1)
        )
        dataset = self.make_dataset()
        # background-thread host pipeline: batch collate (and disk IO for the
        # native loader) overlaps the device step
        batches = prefetch_host(batch_iterator(dataset, bs))

        # joint LAION training: alternate shape-uniform image steps
        # (SPMD-friendly recast of the reference's heterogeneous per-rank
        # frame_lens, configs/t2v_train_laion.yaml)
        image_every = int(cfg.get("image_every", 0))
        image_batches = None
        if image_every:
            img_ds = self.make_image_dataset()
            if img_ds is not None:
                img_bs = int(cfg.get("batch_sizes", {}).get("1", bs))
                # LAION shards are a finite stream — cycle epochs so the
                # alternating schedule never StopIterations a long finetune
                image_batches = batch_iterator(cycle_epochs(img_ds), img_bs)
            else:
                logger.warning("image_every set but no LAION shards found")

        rng = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 1)
        log_interval = int(cfg.get("log_interval", 1))
        save_interval = int(cfg.get("save_ckp_interval", 500))
        viz_interval = int(cfg.get("viz_interval", 0))
        log_dir = cfg.get("log_dir", "workspace/experiment")
        os.makedirs(log_dir, exist_ok=True)
        viz_hook = (
            self.make_viz_hook(log_dir)
            if viz_interval and not self.is_i2v
            else None
        )

        t_start = time.time()
        losses = []
        try:
            return self._train_loop(
                num_steps, batches, image_batches, image_every, rng,
                log_interval, save_interval, viz_interval, viz_hook,
                log_dir, t_start, losses,
            )
        finally:
            # join the prefetch worker — a daemon thread parked on a full
            # queue otherwise outlives the trainer (seen in the r5 suite
            # crash dump as the leaked worker thread)
            batches.close()

    def _train_loop(self, num_steps, batches, image_batches, image_every,
                    rng, log_interval, save_interval, viz_interval,
                    viz_hook, log_dir, t_start, losses):
        # read the starting step ONCE — per-step int(state.step) forces a
        # device sync that stalls async dispatch (the host batch + upload
        # would then run while the chip idles instead of underneath step i+1)
        step0 = int(
            self.lgm_state.step if self.use_lgm_refine else self.state.step
        )
        for i in range(num_steps):
            use_image = (
                image_batches is not None
                and image_every
                and i % image_every == image_every - 1
            )
            host_batch = next(image_batches if use_image else batches)
            feats = self.encode_batch(host_batch)
            if self.use_lgm_refine:
                feats.update(self._gs_features(host_batch))
                feats = shard_batch(self.mesh, feats)
                self.lgm_state, loss, aux = self.refine_step(
                    self.lgm_state, self.frozen, feats, rng
                )
                step = step0 + i + 1
                if step % log_interval == 0:
                    logger.info(
                        "refine psnr %.2f lpips %.4f",
                        float(aux["psnr"]), float(aux["loss_lpips"]),
                    )
            else:
                feats = shard_batch(self.mesh, feats)
                self.state, loss = self.train_step(self.state, feats, rng)
                step = step0 + i + 1
            losses.append(loss)
            if step % log_interval == 0:
                lv = float(jnp.mean(jnp.stack([jnp.asarray(l) for l in losses[-log_interval:]])))
                rate = (i + 1) / (time.time() - t_start)
                logger.info("step %d loss %.4f (%.2f it/s)", step, lv, rate)
            if (viz_interval and self.state is not None
                    and step % viz_interval == 0 and step > 0):
                viz_params = (
                    self.state.ema_params
                    if self.state.ema_params is not None
                    else self.state.params
                )
                if self.is_i2v:
                    # I2V viz conditions on the CURRENT batch (reference
                    # train_i2v_enterance.py:301-327 builds visual_kwards
                    # from the live y_visual/local_image/camera tensors) —
                    # a prompt-file T2V pipeline cannot drive an I2V UNet
                    self.i2v_viz(step, viz_params, feats,
                                 list(host_batch.get("caption", [])), log_dir)
                elif viz_hook is not None:
                    viz_hook(step, viz_params)
            if save_interval and step % save_interval == 0 and step > 0:
                self.save(os.path.join(log_dir, "checkpoints"))
        return float(jnp.asarray(losses[-1]))

    def i2v_viz(self, step: int, params, feats, captions, log_dir: str):
        """Batch-conditioned I2V in-training visualization (reference
        train_i2v_enterance.py:301-327 + visual_train_it2v_video.py:36-123):
        CFG DDIM from the current batch's reference-image conditioning —
        cond row = (y_words, image, local_image), uncond row swaps only
        ``y`` for the negative-prompt embedding, image conditioning stays.
        Never raises: viz must not kill training."""
        try:
            from ..diffusion.samplers import ddim_sample_loop
            from ..utils.video_io import save_video_grid

            viz_num = min(int(self.cfg.get("viz_num", 1)), feats["latents"].shape[0])
            steps = int(self.cfg.get("ddim_timesteps", 50))
            guide_scale = float(
                self.cfg.get("visual_train", {}).get("guide_scale", 6.0)
            )
            if self._i2v_viz_fn is None:
                unet, vae, diffusion = self.unet, self.vae, self.diffusion
                sf = self.scale_factor

                @jax.jit
                def viz_sample(unet_params, vae_params, noise, y, zy, cam,
                               local, img_emb, rng):
                    b = noise.shape[0]

                    def cfg_model(xt, t):
                        x2 = jnp.concatenate([xt, xt], axis=0)
                        t2 = jnp.concatenate([t, t], axis=0)
                        y2 = jnp.concatenate(
                            [y, jnp.broadcast_to(zy, y.shape)], axis=0
                        )
                        c2 = jnp.concatenate([cam, cam], axis=0)
                        l2 = jnp.concatenate([local, local], axis=0)
                        i2 = jnp.concatenate([img_emb, img_emb], axis=0)
                        out = unet.apply(
                            unet_params, x2, t2, y=y2, camera_data=c2,
                            local_image=l2, image=i2,
                        )
                        return out[:b], out[b:]

                    lat = ddim_sample_loop(
                        diffusion, cfg_model, noise, ddim_timesteps=steps,
                        eta=0.0, guide_scale=guide_scale, rng=rng,
                    )
                    bb, cc, ff, hh, ww = lat.shape
                    z = lat.transpose(0, 2, 1, 3, 4).reshape(bb * ff, cc, hh, ww) / sf
                    img = vae.apply(vae_params, z, method=vae.decode)
                    img = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
                    return img.reshape(
                        bb, ff, 3, img.shape[-2], img.shape[-1]
                    ).transpose(0, 1, 3, 4, 2)

                self._i2v_viz_fn = viz_sample

            lat = feats["latents"][:viz_num]
            rng = jax.random.PRNGKey(int(self.cfg.get("seed", 0)) + step)
            noise_rng, sample_rng = jax.random.split(rng)
            noise = jax.random.normal(noise_rng, lat.shape, jnp.float32)
            frames = self._i2v_viz_fn(
                params, self.params["vae"], noise,
                feats["y_words"][:viz_num], self.zero_y,
                feats["camera_data"][:viz_num],
                feats["local_image"][:viz_num],
                feats["image_embed"][:viz_num], sample_rng,
            )
            out_dir = os.path.join(log_dir, "viz")
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, f"viz_step_{step:08d}.mp4")
            frames = (np.asarray(frames) * 255).astype(np.uint8)
            save_video_grid(
                path, [f for f in frames],
                (captions or [""] * viz_num)[:viz_num],
            )
            logger.info("wrote i2v visualization %s", path)
        except Exception as e:
            logger.warning("i2v viz failed: %s", e)

    def make_viz_hook(self, log_dir: str):
        """In-training DDIM visualization (reference visual_train hook,
        train_t2v_enterance.py:326-388; prompts from the validation file —
        the reference asserts ./data/dreamfusion420.txt which it never
        ships, we default to data/validation_prompts.txt)."""
        try:
            from .hooks import VisualTrainHook
            from ..inference.pipeline import T2VPipeline

            prompts_path = self.cfg.get(
                "validation_prompts", "data/validation_prompts.txt"
            )
            if not os.path.exists(prompts_path):
                return None
            with open(prompts_path) as f:
                prompts = [l.strip() for l in f if l.strip()]

            def factory():
                pipe = T2VPipeline(self.cfg, dtype=self.dtype)
                pipe.init_params(load=False)
                pipe._params["vae"] = self.params["vae"]
                pipe._params["clip"] = self.params["clip"]
                return pipe

            return VisualTrainHook(
                factory, prompts, os.path.join(log_dir, "viz"),
                guide_scale=float(
                    self.cfg.get("visual_train", {}).get("guide_scale", 9.0)
                ),
                steps=int(self.cfg.get("ddim_timesteps", 50)),
            )
        except Exception as e:  # viz must never block training
            logger.warning("viz hook unavailable: %s", e)
            return None

    # ------------------------------------------------------------- ckpt

    def save(self, ckpt_dir: str):
        """Orbax checkpoint of the full train state (one logical pytree —
        replaces the per-rank EMA shards of the reference,
        train_t2v_enterance.py:393-411)."""
        import orbax.checkpoint as ocp

        if self.use_lgm_refine:
            step = int(self.lgm_state.step)
            payload = {
                "lgm_params": jax.device_get(self.lgm_state.lgm_params),
                "opt_state": jax.device_get(self.lgm_state.opt_state),
                "step": step,
            }
        else:
            step = int(self.state.step)
            payload = {
                "params": jax.device_get(self.state.params),
                "ema_params": jax.device_get(self.state.ema_params)
                if self.state.ema_params is not None
                else {},
                # full train-state resume: optimizer moments restart from a
                # cold state in the reference (train_t2v_enterance.py:393-411
                # saves weights only) — orbax makes the complete resume free
                "opt_state": jax.device_get(self.state.opt_state),
                "step": step,
            }
        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        logger.info("saved checkpoint %s", path)
        return path

    def restore(self, path: str):
        """Full train-state resume, including optimizer moments (the
        reference restarts Adam state on resume; orbax restores it free)."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        if self.use_lgm_refine:
            from .lgm_refine import LGMTrainState

            target = {
                "lgm_params": jax.device_get(self.lgm_state.lgm_params),
                "opt_state": jax.device_get(self.lgm_state.opt_state),
                "step": 0,
            }
            restored = ckptr.restore(os.path.abspath(path), target)
            self.lgm_state = LGMTrainState(
                step=replicate(self.mesh, jnp.asarray(restored["step"], jnp.int32)),
                lgm_params=replicate(self.mesh, restored["lgm_params"]),
                opt_state=replicate(self.mesh, restored["opt_state"]),
            )
            return self
        target = {
            "params": jax.device_get(self.state.params),
            "ema_params": jax.device_get(self.state.ema_params)
            if self.state.ema_params is not None
            else {},
            "opt_state": jax.device_get(self.state.opt_state),
            "step": 0,
        }
        restored = ckptr.restore(os.path.abspath(path), target)
        # restore onto the training placement: replicated by default, or the
        # fsdp sharding tree — replicating a ZeRO-sharded state would need
        # the full optimizer state per chip, the exact thing fsdp avoids
        sh = getattr(self, "_state_shardings", None)
        if sh is not None:
            put = lambda tree, shard: jax.tree_util.tree_map(  # noqa: E731
                jax.device_put, tree, shard)
            self.state = TrainState(
                step=replicate(self.mesh, jnp.asarray(restored["step"], jnp.int32)),
                params=put(restored["params"], sh.params),
                opt_state=put(restored["opt_state"], sh.opt_state),
                ema_params=put(restored["ema_params"], sh.ema_params)
                if self.state.ema_params is not None
                else None,
            )
            return self
        self.state = TrainState(
            step=replicate(self.mesh, jnp.asarray(restored["step"], jnp.int32)),
            params=replicate(self.mesh, restored["params"]),
            opt_state=replicate(self.mesh, restored["opt_state"]),
            ema_params=replicate(self.mesh, restored["ema_params"])
            if self.state.ema_params is not None
            else None,
        )
        return self
