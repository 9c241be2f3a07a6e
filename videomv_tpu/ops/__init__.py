from .attention import dot_product_attention
from .gaussian_splat import render_gaussians, rasterize_dense, project_gaussians
from .ply_io import save_ply, load_ply

__all__ = [
    "dot_product_attention",
    "render_gaussians",
    "rasterize_dense",
    "project_gaussians",
    "save_ply",
    "load_ply",
]
