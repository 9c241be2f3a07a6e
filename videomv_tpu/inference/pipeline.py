"""Text→multiview inference pipeline.

The TPU-native replacement for the reference inference engine
(/root/reference/tools/inferences/inference_text2video_entrance.py:65-328).
Differences by design:

  - No process spawning / NCCL: one host process drives the chip(s); scale
    is by sharded batch (``videomv_tpu.parallel``).
  - The 50-step CFG DDIM loop is ONE compiled XLA program (lax.scan); the
    reference relaunches kernels per step from Python.
  - Classifier-free guidance runs as a single batched forward (cond row
    stacked with uncond row) — twice the MXU utilization of the reference's
    two sequential UNet calls (diffusion_ddim.py:149-155).
  - VAE decode of all views happens in one batched call (the reference
    chunks through ``decoder_bs=4`` to fit a GPU).
  - The 3D-aware refine path (LGM + Gaussian splatting at DDIM steps
    {20,30,40}) compiles *into* the same scan via lax.cond.

Weights load from released torch checkpoints when paths exist; otherwise
the pipeline runs with random init (shape-true, used for perf benches).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import logging
import os
import time
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AttrDict
from ..data.cameras import (
    GSCameraSettings,
    orbit_c2w_opengl,
    orbit_camera_for_t2v,
    prepare_gs_cameras,
    prepare_gs_training,
)
from ..data.tokenizer import tokenize
from ..diffusion import GaussianDiffusion
from ..diffusion.samplers import ddim_sample_loop
from ..models.autoencoder import AutoencoderKL
from ..models.clip import OpenCLIPTextVisual
from ..models.lgm import LGM, LGMOptions
from ..models.unet_t2v import UNetSD_T2VBase
from ..parallel.infer import frame_parallel_mesh, replicate_params, shard_on_axis
from ..parallel.tp import place_params_tp

logger = logging.getLogger(__name__)


def _kernel_trace_ctx(mesh, kind: str):
    """Trace-time kernel policy for serving meshes: every mesh KEEPS the
    Pallas kernels via grid-local ``shard_map`` wrapping at the call sites
    (ops/serving_mesh.py). Single-axis meshes (frame-parallel 'sp',
    dp-batched 'dp') wrap row-locally; composed ('sp','tp') meshes
    additionally shard attention HEADS over tp wherever the level's head
    count divides (flash attention is head-local — same gate as
    parallel/tp.py's projection sharding, so the specs match GSPMD's
    placement). Call sites that cannot wrap fall back to the XLA
    compositions on sharded traces."""
    if mesh is None:
        return contextlib.nullcontext()
    from ..ops.serving_mesh import serving_kernel_mesh

    if len(mesh.axis_names) == 1:
        return serving_kernel_mesh(mesh, mesh.axis_names[0], kind)
    return serving_kernel_mesh(mesh, "sp", kind, head_axis="tp")


@contextlib.contextmanager
def _pallas_kernels_disabled(enabled: bool = True):
    """Trace-time guard: the Pallas custom calls (flash attention, fused
    GEGLU-FFN) carry no GSPMD partitioning rules, so programs traced over a
    sharded mesh must take the XLA paths (which GSPMD shards fine). The env
    flags are consulted only while tracing; cached executables keep whatever
    they were traced with."""
    if not enabled:
        yield
        return
    on = ("VIDEOMV_DISABLE_PALLAS_ATTN", "VIDEOMV_DISABLE_FUSED_FFN")
    off = ("VIDEOMV_ENABLE_FUSED_SPATIAL",)
    prev = {f: os.environ.get(f) for f in on + off}
    for f in on:
        os.environ[f] = "1"
    for f in off:
        os.environ.pop(f, None)
    try:
        yield
    finally:
        for f, v in prev.items():
            if v is None:
                os.environ.pop(f, None)
            else:
                os.environ[f] = v


def unet_kwargs_from_cfg(unet_cfg: dict) -> dict:
    """Translate the YAML UNet block into module kwargs."""
    m = dict(unet_cfg)
    return dict(
        in_dim=m.get("in_dim", 4),
        dim=m.get("dim", 320),
        y_dim=m.get("y_dim", 1024),
        context_dim=m.get("context_dim", 1024),
        out_dim=m.get("out_dim", 4),
        dim_mult=tuple(m.get("dim_mult", (1, 2, 4, 4))),
        num_heads=m.get("num_heads", 8),
        head_dim=m.get("head_dim", 64),
        num_res_blocks=m.get("num_res_blocks", 2),
        attn_scales=tuple(m.get("attn_scales", (1.0, 0.5, 0.25))),
        dropout=m.get("dropout", 0.1),
        temporal_attention=m.get("temporal_attention", True),
        # USE_TEMPORAL_TRANSFORMER is a code constant in the reference
        # (unet_t2v.py:27); here the dormant rotary/attemask variants are
        # reachable via the `temporal_block` key (or the boolean mirror)
        temporal_block=m.get(
            "temporal_block",
            "transformer" if m.get("use_temporal_transformer", True) else "rotary",
        ),
        temporal_attn_times=m.get("temporal_attn_times", 1),
        use_sim_mask=m.get("use_sim_mask", False),
        use_fps_condition=m.get("use_fps_condition", False),
        use_camera_condition=m.get("use_camera_condition", True),
        use_checkpoint=m.get("use_checkpoint", False),
        remat_policy=m.get("remat_policy", "full"),
    )


@dataclasses.dataclass
class T2VPipeline:
    """Builds models from a merged config and drives generation."""

    cfg: AttrDict
    dtype: Any = jnp.bfloat16
    seed: int = 0

    def __post_init__(self):
        cfg = self.cfg
        # escape hatch for acceptance validation: `sampling_dtype: float32`
        # forces the whole tower stack to fp32 (TPU matmuls otherwise run
        # bf16, ~5e-3 per-op drift — scripts/psnr_vs_reference.py bounds the
        # compounded effect against the 30 dB PSNR budget)
        sd = str(cfg.get("sampling_dtype", "")).lower()
        if sd in ("float32", "fp32", "f32"):
            self.dtype = jnp.float32
        elif sd in ("bfloat16", "bf16"):
            self.dtype = jnp.bfloat16
        d = dict(cfg.get("Diffusion", {}))
        d.pop("type", None)
        d.pop("ddim_timesteps", None)
        self.diffusion = GaussianDiffusion(**d)

        self.max_frames = int(cfg.get("max_frames", 24))
        self.resolution = list(cfg.get("resolution", [256, 256]))
        self.scale = int(cfg.get("scale", 8))
        self.latent_hw = (
            self.resolution[1] // self.scale,
            self.resolution[0] // self.scale,
        )
        self.scale_factor = float(cfg.get("scale_factor", 0.18215))
        self.use_lgm_refine = bool(cfg.get("UNet", {}).get("use_lgm_refine", False))

        self.unet = UNetSD_T2VBase(
            dtype=self.dtype, **unet_kwargs_from_cfg(cfg.get("UNet", {}))
        )
        self.vae = AutoencoderKL(dtype=self.dtype)
        self.clip = OpenCLIPTextVisual(dtype=self.dtype)
        lgm_variant = str(cfg.get("lgm_variant", "big"))
        self.lgm = (
            LGM(opt=getattr(LGMOptions, lgm_variant)(), dtype=self.dtype)
            if self.use_lgm_refine else None
        )
        # reference renders the refine views at 512² then nearest-downsamples
        # to 256 before re-encoding (unet_t2v.py:426-428); gs_render_size=256
        # renders directly at the target resolution — visually equivalent and
        # ~4× cheaper through the splat pipeline
        self.gs_settings = GSCameraSettings(
            input_size=int(cfg.get("gs_input_size",
                                   self.lgm.opt.input_size if self.lgm else 256)),
            output_size=int(cfg.get("gs_render_size", 256)),
        )

        self._params: Dict[str, Any] = {}
        self._samplers: Dict[Any, Any] = {}
        self._decode_fn = None
        self._encode_text_fn = None
        self._camera_cache: Dict[Any, Any] = {}
        self._negative_cache: Dict[str, Any] = {}
        # frame-parallel (sequence-parallel) serving state, built lazily on
        # the first generate(frame_parallel=True) call; _params_sp/_sp_cache
        # invalidate on (re)loading weights
        self._sp_tried = False
        self._sp_mesh = None
        self._params_sp = None
        self._params_dp = None
        self._sp_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------ params

    def init_params(self, rng: Optional[jax.Array] = None, load: bool = True):
        """Initialize (and optionally load) all model params."""
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed)
        b, f = 1, self.max_frames
        h, w = self.latent_hw
        r1, r2, r3, r4 = jax.random.split(rng, 4)

        t0 = time.time()
        x = jnp.zeros((b, 4, f, h, w))
        t = jnp.zeros((b,), jnp.int32)
        y = jnp.zeros((b, 77, self.unet.context_dim))
        cam = jnp.zeros((b, f, 16))
        self._params["unet"] = jax.jit(self.unet.init)(r1, x, t, y=y, camera_data=cam)

        img = jnp.zeros((1, 3, self.resolution[1], self.resolution[0]))
        self._params["vae"] = jax.jit(self.vae.init)(r2, img)

        toks = jnp.zeros((1, 77), jnp.int32)
        self._params["clip"] = jax.jit(
            functools.partial(self.clip.init, method=self.clip.encode_text)
        )(r3, toks)

        if self.lgm is not None:
            lgm_in = jnp.zeros((1, 4, 9, self.gs_settings.input_size, self.gs_settings.input_size))
            self._params["lgm"] = jax.jit(self.lgm.init)(r4, lgm_in)
        logger.info("param init took %.1fs", time.time() - t0)
        self._params_sp = None  # fresh params invalidate the mesh snapshots
        self._params_dp = None
        self._negative_cache.clear()  # encodings from the old CLIP weights

        if load:
            self.load_weights()
        else:
            self._cast_params_storage()
        return self._params

    def load_weights(self):
        """Tolerantly load released torch checkpoints if paths exist
        (reference strict=False load, inference_text2video_entrance.py:137-144)."""
        import os

        from ..training.checkpoints import (
            convert_lgm,
            convert_open_clip,
            convert_unet,
            convert_vae,
            load_torch_checkpoint,
        )

        cfg = self.cfg
        jobs = []
        if cfg.get("test_model") and os.path.exists(cfg.test_model):
            jobs.append(("unet", cfg.test_model, convert_unet))
            if self.lgm is not None:
                jobs.append(("lgm", cfg.test_model, convert_lgm))
        ae = cfg.get("auto_encoder", {})
        if ae.get("pretrained") and os.path.exists(ae.pretrained):
            jobs.append(("vae", ae.pretrained, convert_vae))
        emb = cfg.get("embedder", {})
        if emb.get("pretrained") and os.path.exists(emb.pretrained):
            jobs.append(("clip", emb.pretrained, convert_open_clip))
        if cfg.get("lgm_pretrain") and os.path.exists(cfg.lgm_pretrain) and self.lgm is not None:
            jobs.append(("lgm", cfg.lgm_pretrain, convert_lgm))

        min_matched = float(cfg.get("min_matched_fraction", 0.9))
        for name, path, fn in jobs:
            sd = load_torch_checkpoint(path)
            self._params[name], report = fn(sd, self._params[name])
            n_target = len(report["matched"]) + len(report["missing"])
            frac = len(report["matched"]) / max(n_target, 1)
            logger.info(
                "loaded %s from %s: %d matched (%.0f%%), %d missing, %d unexpected",
                name, path, len(report["matched"]), 100 * frac,
                len(report["missing"]), len(report["unexpected"]),
            )
            # a mostly-unmatched load means silent garbage outputs — fail
            # loudly instead of proceeding with random-init weights
            # (tolerant-load parity covers a few heads, not a layout mismatch)
            if frac < min_matched:
                raise ValueError(
                    f"checkpoint {path} matched only {frac:.1%} of the {name} "
                    f"param tree (threshold {min_matched:.0%}); first missing: "
                    f"{report['missing'][:5]}; first mismatched: "
                    f"{report['mismatched'][:3]}. Set min_matched_fraction in "
                    "the config to override."
                )
        # new weights invalidate the mesh-replicated param snapshots and any
        # negative-prompt encodings produced by the previous CLIP weights
        self._params_sp = None
        self._params_dp = None
        self._negative_cache.clear()
        self._cast_params_storage()

    def _cast_params_storage(self):
        """Optional bf16 param storage for serving (config
        ``params_dtype: bfloat16``).

        Every compute path already casts weights to ``self.dtype`` in-program
        (A/B measured perf-neutral: 155.0 vs 156.2 ms/fwd, PERF.md), but fp32
        STORAGE is what OOMs the 16 GB v5e when the full conditioning stack
        is resident — the I2V pipeline carries the adapter-laden UNet + the
        full CLIP text+visual towers + VAE + LGM (~12 GB fp32), and the
        refined sample died RESOURCE_EXHAUSTED on hardware (round-3
        i2v_e2e log). bf16 storage halves that to ~6 GB.

        Leaves are cast ONE AT A TIME with the source tree's references
        dropped first, so peak memory is total + one leaf — a whole-tree
        ``tree_map(astype)`` would transiently hold both copies (~18 GB).
        Ignored under fp32 sampling (the acceptance escape hatch needs fp32
        weights)."""
        pd = str(self.cfg.get("params_dtype", "")).lower()
        if pd in ("", "none", "float32", "fp32", "f32"):
            return
        if pd not in ("bfloat16", "bf16"):
            raise ValueError(f"params_dtype must be bfloat16 or float32, got {pd!r}")
        if self.dtype != jnp.bfloat16:
            logger.warning("params_dtype bfloat16 ignored: sampling_dtype is fp32")
            return
        for name in list(self._params):
            tree = self._params[name]
            leaves, treedef = jax.tree_util.tree_flatten(tree)
            self._params[name] = None
            del tree
            for i, leaf in enumerate(leaves):
                if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
                    leaves[i] = leaf.astype(jnp.bfloat16)
            self._params[name] = jax.tree_util.tree_unflatten(treedef, leaves)

    def release_samplers(self):
        """Drop every compiled sampler executable (HBM residency control).

        A 50-step full-size sampler executable holds multi-GB scratch
        reservations on the 16 GB v5e; serving flows that switch program
        shapes (plain → GS-refined, or steps/guide changes) can evict the
        superseded executables instead of accumulating them. The jitted
        callables are rebuilt on next use — a cache hit via the persistent
        compile cache, not a cold compile."""
        for fn in self._samplers.values():
            try:
                fn.clear_cache()
            except AttributeError:
                pass
        self._samplers.clear()
        self._decode_fn = None

    # ---------------------------------------------------------- builders

    def encode_text(self, prompts: Sequence[str]) -> jnp.ndarray:
        """Prompts → y_words [B, 77, 1024] (penultimate-layer token sequence)."""
        toks = jnp.asarray(tokenize(list(prompts)))
        if self._encode_text_fn is None:
            self._encode_text_fn = jax.jit(
                lambda p, t: self.clip.apply(p, t, method=self.clip.encode_text)[1]
            )
        return self._encode_text_fn(self._params["clip"], toks)

    def _get_cameras(self, elevation: float, camera_distance: float):
        """Orbit camera conditioning + splat cameras/rays, cached per orbit
        on the host math AND the device arrays (the Plücker rays alone are
        37 MB; re-doing the numpy + tunnel upload per call cost ~1.4 s of
        every sample). Returns (cam [1,F,16], rays, cam_view, cam_view_proj).
        """
        cam_key = (self.max_frames, float(elevation), float(camera_distance),
                   bool(self.cfg.get("reference_inference_cameras", False)))
        cached = self._camera_cache.get(cam_key)
        if cached is None:
            cam = jnp.asarray(
                orbit_camera_for_t2v(self.max_frames, elevation, camera_distance)
            )
            # gs cameras use the TRAINING-consistent chain (the LGM
            # checkpoints' native convention);
            # cfg['reference_inference_cameras'] reproduces the reference
            # inference engine's mirrored variant bit-for-bit.
            if cam_key[3]:
                gs = prepare_gs_cameras(
                    np.asarray(cam), self.gs_settings,
                    ray_size=self.gs_settings.input_size,
                )
            else:
                gs = prepare_gs_training(
                    orbit_c2w_opengl(self.max_frames, elevation, camera_distance),
                    self.gs_settings, ray_size=self.gs_settings.input_size,
                )
            cached = (
                cam,
                jnp.asarray(gs["input_rays"]),
                jnp.asarray(gs["cam_view"]),
                jnp.asarray(gs["cam_view_proj"]),
            )
            self._camera_cache[cam_key] = cached
        return cached

    def _serving_mesh(self):
        """Build (once) the single-sample serving mesh for
        ``generate(frame_parallel=True)``.

        Default: 1-D ``('sp',)`` frame-parallel mesh (largest divisor of
        ``max_frames``). With ``cfg.serving_tp > 1``: a composed 2-D
        ``('sp', 'tp')`` mesh — frames over sp AND attention heads over tp
        (parallel/tp.py), so one sample can use more devices than it has
        frames."""
        if self._sp_tried:
            return self._sp_mesh
        self._sp_tried = True
        tp_n = int(self.cfg.get("serving_tp", 1))
        if tp_n <= 1:
            self._sp_mesh = frame_parallel_mesh(self.max_frames)
            return self._sp_mesh
        avail = len(jax.devices())
        budget = max(avail // tp_n, 1)
        sp_n = max(d for d in range(1, budget + 1) if self.max_frames % d == 0)
        if sp_n * tp_n > avail or sp_n * tp_n == 1:
            logger.warning(
                "serving_tp=%d: no usable mesh on %d devices — single-device",
                tp_n, avail,
            )
            self._sp_mesh = None
            return None
        from jax.sharding import Mesh

        devices = np.asarray(jax.devices()[: sp_n * tp_n]).reshape(sp_n, tp_n)
        self._sp_mesh = Mesh(devices, axis_names=("sp", "tp"))
        return self._sp_mesh

    def _place_params_serving(self, sp):
        """All model params placed on the serving mesh: replicated, except
        the UNet's attention projections when the mesh carries a 'tp' axis
        (head-sharded per tp_shardings; VAE/CLIP/LGM stay replicated —
        their attention layouts are not head-gated and they are a few
        percent of the step)."""
        if "tp" in sp.axis_names:
            placed = replicate_params(
                sp, {k: v for k, v in self._params.items() if k != "unet"}
            )
            placed["unet"] = place_params_tp(
                sp, self._params["unet"], head_dim=self.unet.head_dim
            )
            return placed
        return replicate_params(sp, self._params)

    def _sp_place_orbit(self, sp, elevation: float, camera_distance: float):
        """Orbit constants placed on the frame-parallel mesh, cached per
        orbit: cam + Plücker rays frame-sharded, splat cameras replicated.
        Weight-independent (pure camera math), so weight reloads need not
        invalidate this cache. Without it the 37 MB rays re-upload and
        reshard on every call."""
        ck = ("sp", self.max_frames, float(elevation), float(camera_distance),
              bool(self.cfg.get("reference_inference_cameras", False)))
        cached = self._sp_cache.get(ck)
        if cached is None:
            cam, gs_rays, gs_cv, gs_cvp = self._get_cameras(elevation, camera_distance)
            cached = (
                shard_on_axis(sp, cam, 1),
                shard_on_axis(sp, gs_rays, 1),
                *replicate_params(sp, (gs_cv, gs_cvp)),
            )
            self._sp_cache[ck] = cached
        return cached

    def _build_sampler(self, steps: int, guide_scale: float, with_refine: bool,
                       b: int = 1, view_mesh=None, view_mesh_axis: str = "sp",
                       view_mesh_dim: str = "view"):
        """Compile the full sampling program once per (steps, guidance,
        refine, batch[, serving mesh — the refine's splat render needs an
        explicit shard_map over the view (frame-parallel) or batch (dp)
        axis]).

        Model params are explicit jit arguments — closing over them would
        bake gigabytes of weights into the program as constants and multiply
        compile time."""
        unet, vae, lgm = self.unet, self.vae, self.lgm
        f = self.max_frames
        sf = self.scale_factor
        diffusion = self.diffusion
        gs_settings = self.gs_settings

        @jax.jit
        def sample(params, noise, y, zero_y, cam, gs_rays, cam_view, cam_view_proj, rng):
            def cfg_model(xt, t):
                x2 = jnp.concatenate([xt, xt], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                y2 = jnp.concatenate([y, zero_y], axis=0)
                c2 = jnp.concatenate([cam, cam], axis=0)
                out = unet.apply(params["unet"], x2, t2, y=y2, camera_data=c2)
                return out[:b], out[b:]

            refine_fn = None
            if with_refine and lgm is not None:
                from .refine import REFINE_VIEW_IDXS, make_refine_fn

                refine_fn = make_refine_fn(
                    unet=unet, vae=vae, lgm=lgm, params=params,
                    diffusion=diffusion, scale_factor=sf, batch=b,
                    gs_settings=gs_settings,
                    y=y, zero_y=zero_y, cam=cam, gs_rays=gs_rays,
                    cam_view=cam_view, cam_view_proj=cam_view_proj,
                    uncond_mode=str(self.cfg.get("gs_refine_uncond", "full")),
                    view_idxs=tuple(self.cfg.get("gs_refine_views", REFINE_VIEW_IDXS)),
                    view_mesh=view_mesh, view_mesh_axis=view_mesh_axis,
                    view_mesh_dim=view_mesh_dim,
                )
            latents = ddim_sample_loop(
                diffusion, cfg_model, noise,
                ddim_timesteps=steps, eta=0.0, guide_scale=guide_scale,
                refine_fn=refine_fn,
                # refine fires at these loop indices — reference contract
                # diffusion_ddim.py:256-259 (steps {20,30,40} of 50)
                refine_steps=tuple(self.cfg.get("gs_refine_steps", (20, 30, 40))),
                rng=rng,
            )
            return latents

        return sample

    def _decode_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        """[B, 4, F, h, w] → [B, F, H, W, 3] uint8 (on device).

        The round + uint8 cast happens IN the jitted program: downloading
        fp32 frames through the tunnel costs 4× the bytes (18.9 MB vs
        4.7 MB for 24×256² views) for a bit-identical result — the host
        used to run the same jnp.round before its cast."""
        if self._decode_fn is None:
            vae, sf = self.vae, self.scale_factor

            @jax.jit
            def decode(params, z):
                b, c, f, h, w = z.shape
                z = z.transpose(0, 2, 1, 3, 4).reshape(b * f, c, h, w) / sf
                img = vae.apply(params, z, method=vae.decode)  # [BF, 3, H, W]
                img = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
                img = img.reshape(b, f, 3, img.shape[-2], img.shape[-1]).transpose(0, 1, 3, 4, 2)
                return jnp.round(img * 255.0).astype(jnp.uint8)

            self._decode_fn = decode
        vae_params = self._params["vae"]
        sh = getattr(latents, "sharding", None)
        if isinstance(sh, jax.sharding.NamedSharding):
            # mesh-sharded sampling (frame-parallel or dp batch) left the
            # latents on a mesh: decode with the mesh-resident vae params
            # so the program shards instead of mixing device sets
            if self._params_sp is not None and sh.mesh == self._sp_mesh:
                vae_params = self._params_sp["vae"]
            elif self._params_dp is not None:
                vae_params = self._params_dp["vae"]
        return self._decode_fn(vae_params, latents)

    # ---------------------------------------------------------- generate

    def generate(
        self,
        prompt: str,
        steps: int = 50,
        guide_scale: Optional[float] = None,
        use_gs_refine: bool = False,
        seed: Optional[int] = None,
        elevation: float = 15.0,
        camera_distance: float = 2.0,
        y_words: Optional[jnp.ndarray] = None,
        negative_words: Optional[jnp.ndarray] = None,
        frame_parallel: bool = False,
    ) -> Dict[str, np.ndarray]:
        """One prompt → 24 orbit views. Returns frames uint8 [F, H, W, 3].

        ``frame_parallel=True`` shards THIS sample's frame axis over all
        local devices (``parallel/infer.py`` sequence parallelism): spatial
        blocks run frame-local, GSPMD inserts the cross-frame collectives
        at the temporal blocks — single-sample latency scaling the
        reference (one sample per GPU) has no analog of. No-op on one
        device."""
        assert self._params, "call init_params() first"
        cfg = self.cfg
        guide_scale = guide_scale if guide_scale is not None else float(cfg.get("guide_scale", 9.0))
        seed = seed if seed is not None else int(cfg.get("seed", 0))

        if "3d asset" not in prompt:
            prompt = prompt + ", 3d asset"

        if y_words is None:
            y_words = self.encode_text([prompt])
        if negative_words is None:
            neg = cfg.get("negative_prompt", "")
            negative_words = self._negative_cache.get(neg)
            if negative_words is None:
                negative_words = self.encode_text([neg])
                self._negative_cache[neg] = negative_words

        cam, gs_rays, gs_cv, gs_cvp = self._get_cameras(elevation, camera_distance)

        rng = jax.random.PRNGKey(seed)
        noise_rng, sample_rng = jax.random.split(rng)
        h, w = self.latent_hw
        noise = jax.random.normal(noise_rng, (1, 4, self.max_frames, h, w))

        params = self._params
        sp = None
        if frame_parallel:
            sp = self._serving_mesh()
            if sp is not None:
                if self._params_sp is None:
                    self._params_sp = self._place_params_serving(sp)
                # placement is the annotation: the SAME jitted sampler
                # recompiles once for the sharded input layout. Every input
                # must live on the mesh (jit rejects mixed device sets), so
                # the non-frame args are replicated. Orbit constants (the
                # 37 MB rays above all) are resharded once per orbit, not
                # per call.
                params = self._params_sp
                cam, gs_rays, gs_cv, gs_cvp = self._sp_place_orbit(
                    sp, elevation, camera_distance)
                noise = shard_on_axis(sp, noise, 2)
                # per-call conditioning (incl. any caller-supplied negative
                # encoding) is tiny — replicate fresh, never cache it
                y_words, negative_words, sample_rng = replicate_params(
                    sp, (y_words, negative_words, sample_rng))

        # the refine branch's program differs under frame-parallel (the
        # splat render becomes an explicit shard_map over the view axis),
        # so the sampler cache keys on the mesh too
        key = (steps, guide_scale, use_gs_refine, 1, sp is not None)
        if key not in self._samplers:
            self._samplers[key] = self._build_sampler(
                steps, guide_scale, use_gs_refine,
                view_mesh=sp if use_gs_refine else None)

        with _kernel_trace_ctx(sp, "frame"):
            # frame-sharded traces keep the Pallas kernels via row-local
            # shard_map wrapping (composed sp×tp meshes disable them — see
            # _kernel_trace_ctx); read at trace time only, compiled
            # executables keep whatever they were traced with
            latents = self._samplers[key](
                params, noise, y_words, negative_words, cam,
                gs_rays, gs_cv, gs_cvp, sample_rng,
            )
        frames = self._decode_latents(latents)
        frames_np = np.asarray(frames[0])
        return {"frames": frames_np, "latents": np.asarray(latents)}

    def generate_batch(
        self,
        prompts,
        steps: int = 50,
        guide_scale: Optional[float] = None,
        use_gs_refine: bool = False,
        seed: Optional[int] = None,
        elevation: float = 15.0,
        camera_distance: float = 2.0,
        data_parallel: bool = False,
        force_batched: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Batched multi-prompt sampling: one compiled program over B
        prompts. With ``data_parallel`` and a multi-device runtime, the
        batch shards over a dp mesh and GSPMD runs each prompt's denoising
        on its own chip — the serving-scale path (no reference counterpart;
        the reference loops prompts on one GPU). Returns frames uint8
        [B, F, H, W, 3].

        On ONE device the batched program is a measured loss, not a win:
        the CFG forward is HBM-bandwidth-bound, so the B=4 program ran at
        0.83× of sequential throughput (41.9 s vs 34.6 s for 4 samples,
        scripts/batch_throughput_tpu.py, PERF.md) — batching buys no MXU
        utilization and the 4× working set evicts what the single-sample
        program keeps resident. Single-device calls therefore loop the
        (already-compiled) single-sample program per prompt; pass
        ``force_batched=True`` to override (A/B harnesses)."""
        from ..parallel import make_mesh, shard_batch

        cfg = self.cfg
        guide_scale = guide_scale if guide_scale is not None else float(
            cfg.get("guide_scale", 9.0))
        seed = seed if seed is not None else int(cfg.get("seed", 0))
        b = len(prompts)
        prompts = [p if "3d asset" in p else p + ", 3d asset" for p in prompts]

        y_words = self.encode_text(list(prompts))
        neg = cfg.get("negative_prompt", "")
        zero1 = self._negative_cache.get(neg)
        if zero1 is None:
            zero1 = self.encode_text([neg])
            self._negative_cache[neg] = zero1

        if not force_batched and b > 1 and jax.device_count() == 1:
            frames_seq, lat_seq = [], []
            for i in range(b):
                r = self.generate(
                    prompts[i], steps=steps, guide_scale=guide_scale,
                    use_gs_refine=use_gs_refine, seed=seed + i,
                    elevation=elevation, camera_distance=camera_distance,
                    y_words=y_words[i:i + 1], negative_words=zero1,
                )
                frames_seq.append(r["frames"])
                lat_seq.append(r["latents"][0])
            return {"frames": np.stack(frames_seq),
                    "latents": np.stack(lat_seq)}

        zero_y = jnp.broadcast_to(zero1, (b,) + zero1.shape[1:])

        cam1, gs_rays, gs_cv, gs_cvp = self._get_cameras(elevation, camera_distance)
        cam = jnp.broadcast_to(cam1, (b,) + cam1.shape[1:])

        h, w = self.latent_hw
        rng = jax.random.PRNGKey(seed)
        noise_rng, sample_rng = jax.random.split(rng)
        noise = jax.random.normal(noise_rng, (b, 4, self.max_frames, h, w))

        b_run = b
        params = self._params
        dp_mesh = None
        if data_parallel and jax.device_count() > 1:
            n = jax.device_count()
            pad = (-b) % n
            if pad:
                # pad-and-mask: replicate the last prompt's rows so the
                # batch shards evenly, drop the padding after decode
                def _pad(x):
                    last = jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])
                    return jnp.concatenate([x, last], axis=0)

                noise, y_words = _pad(noise), _pad(y_words)
                zero_y, cam = _pad(zero_y), _pad(cam)
                b_run = b + pad
            dp_mesh = make_mesh()
            sharded = shard_batch(dp_mesh, {"noise": noise, "y": y_words,
                                            "zero_y": zero_y, "cam": cam})
            noise, y_words = sharded["noise"], sharded["y"]
            zero_y, cam = sharded["zero_y"], sharded["cam"]
            # weights and orbit constants live on the mesh too — explicit
            # one-time placement instead of a per-call implicit transfer of
            # the 2.8 GB param tree at dispatch
            if self._params_dp is None:
                self._params_dp = replicate_params(dp_mesh, self._params)
            params = self._params_dp
            neg_k = cfg.get("negative_prompt", "")
            ck = ("dp", self.max_frames, float(elevation),
                  float(camera_distance), neg_k)
            cached = self._sp_cache.get(ck)
            if cached is None:
                cached = replicate_params(dp_mesh, (gs_rays, gs_cv, gs_cvp))
                self._sp_cache[ck] = cached
            gs_rays, gs_cv, gs_cvp = cached
            sample_rng = replicate_params(dp_mesh, sample_rng)

        key = (steps, guide_scale, use_gs_refine, b_run, dp_mesh is not None)
        if key not in self._samplers:
            self._samplers[key] = self._build_sampler(
                steps, guide_scale, use_gs_refine, b=b_run,
                view_mesh=dp_mesh if use_gs_refine else None,
                view_mesh_axis="dp", view_mesh_dim="batch")
        with _kernel_trace_ctx(dp_mesh, "batch"):
            # batch-sharded traces keep the Pallas kernels the same way
            # (row-local shard_map over the dp axis)
            latents = self._samplers[key](
                params, noise, y_words, zero_y, cam,
                gs_rays, gs_cv, gs_cvp, sample_rng,
            )
        frames = self._decode_latents(latents)
        frames_np = np.asarray(frames)
        return {"frames": frames_np[:b], "latents": np.asarray(latents)[:b]}

    # ------------------------------------------------------- 3D export

    def reconstruct_gaussians(
        self,
        frames: np.ndarray,
        elevation: float = 15.0,
        camera_distance: float = 2.0,
    ) -> np.ndarray:
        """Run the LGM on the 4 canonical views of a generated orbit and
        return the Gaussian-splat scene [N, 14] (pos|opacity|scale|quat|rgb,
        activated — the ``render_gaussians``/``save_ply`` contract).

        ``frames``: ``generate()['frames']`` (F×H×W×3, uint8 or [0,1]
        float). Exceeds the reference inference surface (which constructs
        the same Gaussians transiently inside the refine branch and never
        exposes them) using only reference components: LGM 'big' +
        ``core/gs.py``-style PLY compaction via ``ops.ply_io.save_ply``."""
        from .refine import _VID_MEAN, _VID_STD

        assert self.lgm is not None, "config must set UNet.use_lgm_refine"
        f = np.asarray(frames, np.float32)
        if f.max() > 1.5:
            f = f / 255.0
        # 4 evenly spaced orbit views — (0, 6, 12, 18) at the reference's
        # 24 frames (unet_t2v.py:407), generalized to any frame count
        idxs = [i * f.shape[0] // 4 for i in range(4)]
        views = f[idxs].transpose(0, 3, 1, 2)  # [4,3,H,W]
        s = self.gs_settings.input_size
        if views.shape[-1] != s:
            views = np.asarray(jax.image.resize(
                jnp.asarray(views), (4, 3, s, s), method="bilinear"))
        views = (views - _VID_MEAN.reshape(1, 3, 1, 1)) / _VID_STD.reshape(1, 3, 1, 1)

        _, gs_rays, _, _ = self._get_cameras(elevation, camera_distance)
        rays = jnp.take(gs_rays, jnp.asarray(idxs), axis=1)[0]

        lgm_in = jnp.concatenate(
            [jnp.asarray(views), rays.astype(jnp.float32)], axis=1
        )[None]  # [1, 4, 9, S, S]
        if not hasattr(self, "_lgm_fn") or self._lgm_fn is None:
            self._lgm_fn = jax.jit(self.lgm.apply)
        gaussians = self._lgm_fn(self._params["lgm"], lgm_in)
        return np.asarray(gaussians[0])

    def export_ply(self, frames: np.ndarray, path: str, **kw) -> np.ndarray:
        """``reconstruct_gaussians`` + reference-compatible ``.ply`` dump."""
        from ..ops.ply_io import save_ply

        gaussians = self.reconstruct_gaussians(frames, **kw)
        save_ply(gaussians, path)
        return gaussians
