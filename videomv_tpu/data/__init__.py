from .cameras import (
    create_camera_to_world_matrix,
    get_camera,
    get_rays,
    prepare_gs_cameras,
)

__all__ = [
    "create_camera_to_world_matrix",
    "get_camera",
    "get_rays",
    "prepare_gs_cameras",
]
