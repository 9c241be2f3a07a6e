from .pipeline import T2VPipeline

__all__ = ["T2VPipeline"]
