"""Default configuration tree.

Mirrors the reference module-level defaults
(/root/reference/tools/modules/config.py:8-196) so the shipped task YAMLs
load identically: task YAML keys update (not replace) these dicts, so e.g.
``UNet.dim=320`` survives a YAML that omits it
(train_t2v_enterance.py:38-42).
"""


def default_cfg() -> dict:
    return {
        # dataset
        "mean": [0.5, 0.5, 0.5],
        "std": [0.5, 0.5, 0.5],
        "max_words": 1000,
        "num_workers": 8,
        "prefetch_factor": 2,
        "resolution": [448, 256],
        "vit_out_dim": 1024,
        "vit_resolution": 336,
        "frame_lens": [32, 32, 32, 1],
        "sample_fps": [4],
        "vid_dataset": {
            "type": "VideoDataset",
            "data_list": [],
            "max_words": 1000,
            "resolution": [448, 256],
        },
        "img_dataset": {
            "type": "ImageDataset",
            "data_list": [],
            "max_words": 1000,
            "resolution": [448, 256],
        },
        "batch_sizes": {"1": 256, "4": 4, "8": 4, "16": 4},
        # diffusion
        "Diffusion": {
            "type": "DiffusionDDIM",
            "schedule": "cosine",
            "schedule_param": {
                "num_timesteps": 1000,
                "cosine_s": 0.008,
                "zero_terminal_snr": True,
            },
            "mean_type": "v",
            "loss_type": "mse",
            "var_type": "fixed_small",
            "rescale_timesteps": False,
            "noise_strength": 0.1,
            "ddim_timesteps": 50,
        },
        "ddim_timesteps": 50,
        "use_div_loss": False,
        "p_zero": 0.9,
        "guide_scale": 3.0,
        # clip vision normalization
        "vit_mean": [0.48145466, 0.4578275, 0.40821073],
        "vit_std": [0.26862954, 0.26130258, 0.27577711],
        # model
        "scale_factor": 0.18215,
        "use_checkpoint": True,
        "use_sharded_ddp": False,
        "use_fsdp": False,
        "use_fp16": True,
        "temporal_attention": True,
        "UNet": {
            "type": "UNetSD",
            "in_dim": 4,
            "dim": 320,
            "y_dim": 1024,
            "context_dim": 1024,
            "out_dim": 8,
            "dim_mult": [1, 2, 4, 4],
            "num_heads": 8,
            "head_dim": 64,
            "num_res_blocks": 2,
            "attn_scales": [1.0, 0.5, 0.25],
            "dropout": 0.1,
            "temporal_attention": True,
            "temporal_attn_times": 1,
            "use_checkpoint": True,
            "use_fps_condition": False,
            "use_sim_mask": False,
        },
        "guidances": [],
        "auto_encoder": {
            "type": "AutoencoderKL",
            "ddconfig": {
                "double_z": True,
                "z_channels": 4,
                "resolution": 256,
                "in_channels": 3,
                "out_ch": 3,
                "ch": 128,
                "ch_mult": [1, 2, 4, 4],
                "num_res_blocks": 2,
                "attn_resolutions": [],
                "dropout": 0.0,
                "video_kernel_size": [3, 1, 1],
            },
            "embed_dim": 4,
            "pretrained": "./pretrained_models/modelscope_t2v/VQGAN_autoencoder.pth",
        },
        "embedder": {
            "type": "FrozenOpenCLIPEmbedder",
            "layer": "penultimate",
            "pretrained": "modelscope_t2v/open_clip_pytorch_model.bin",
        },
        # training
        "ema_decay": 0.9999,
        "num_steps": 600000,
        "lr": 5e-5,
        "weight_decay": 0.0,
        "betas": (0.9, 0.999),
        "eps": 1.0e-8,
        "chunk_size": 16,
        "decoder_bs": 8,
        "alpha": 0.7,
        "save_ckp_interval": 1000,
        "warmup_steps": 10,
        "decay_mode": "cosine",
        "use_ema": True,
        "load_from": None,
        "Pretrain": {
            "type": "pretrain_specific_strategies",
            "fix_weight": False,
            "grad_scale": 0.2,
            "resume_checkpoint": "models/jiuniu_0267000.pth",
            "sd_keys_path": "data/stable_diffusion_image_key_temporal_attention_x1.json",
        },
        # visualization / logging
        "viz_interval": 1000,
        "visual_train": {"type": "VisualTrainTextImageToVideo"},
        "visual_inference": {"type": "VisualGeneratedVideos"},
        "inference_list_path": "",
        "log_interval": 100,
        "log_dir": "workspace/temp_dir",
        # misc
        "seed": 8888,
        "negative_prompt": (
            "Distorted, discontinuous, Ugly, blurry, low resolution, disfigured, "
            "disconnected limbs, Ugly faces, incomplete arms"
        ),
        "ENABLE": True,
        "debug": False,
    }
