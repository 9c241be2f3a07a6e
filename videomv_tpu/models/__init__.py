from .blocks import (
    DropPath,
    RelativePositionBias,
    TemporalAttentionBlock,
    TemporalAttentionMultiBlock,
    TemporalTransformerAttemask,
    rotary_rotate,
)
from .unet_t2v import UNetSD_T2VBase, build_unet_plan
from .unet_i2v import UNetSD_I2VGen
from .autoencoder import AutoencoderKL
from .clip import OpenCLIPTextVisual, CLIPTextTower, CLIPVisionTower
from .lgm import LGM, LGMOptions
from .lpips import LPIPS, convert_lpips

__all__ = [
    "UNetSD_T2VBase",
    "UNetSD_I2VGen",
    "build_unet_plan",
    "AutoencoderKL",
    "OpenCLIPTextVisual",
    "CLIPTextTower",
    "CLIPVisionTower",
    "LGM",
    "LGMOptions",
    "LPIPS",
    "convert_lpips",
    "DropPath",
    "RelativePositionBias",
    "TemporalAttentionBlock",
    "TemporalAttentionMultiBlock",
    "TemporalTransformerAttemask",
    "rotary_rotate",
]
