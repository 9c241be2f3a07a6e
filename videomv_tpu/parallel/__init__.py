from .infer import frame_parallel_mesh, replicate_params, shard_on_axis
from .mesh import (
    fsdp_shardings, init_distributed, make_mesh, replicate, shard_batch,
)
from .tp import place_params_tp, tensor_parallel_mesh, tp_shardings
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
    "fsdp_shardings",
    "build_train_step",
    "make_t2v_apply",
    "make_i2v_apply",
    "TrainState",
    "frame_parallel_mesh",
    "replicate_params",
    "shard_on_axis",
    "tensor_parallel_mesh",
    "tp_shardings",
    "place_params_tp",
]
