from .unet_t2v import UNetSD_T2VBase, build_unet_plan

__all__ = ["UNetSD_T2VBase", "build_unet_plan"]
