from .seed import setup_seed
from .video_io import save_video_grid, save_multiview_video

__all__ = ["setup_seed", "save_video_grid", "save_multiview_video"]
