from .mesh import init_distributed, make_mesh, shard_batch, replicate
from .train_step import (
    TrainState,
    build_train_step,
    make_i2v_apply,
    make_t2v_apply,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "shard_batch",
    "replicate",
    "build_train_step",
    "make_t2v_apply",
    "make_i2v_apply",
    "TrainState",
]
