from .mesh import make_mesh, shard_batch, replicate
from .train_step import build_train_step, TrainState

__all__ = ["make_mesh", "shard_batch", "replicate", "build_train_step", "TrainState"]
