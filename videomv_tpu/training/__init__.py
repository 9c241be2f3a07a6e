from .checkpoints import (
    load_torch_checkpoint,
    map_torch_to_flax,
    convert_open_clip,
    convert_vae,
    convert_unet,
)

__all__ = [
    "load_torch_checkpoint",
    "map_torch_to_flax",
    "convert_open_clip",
    "convert_vae",
    "convert_unet",
]
