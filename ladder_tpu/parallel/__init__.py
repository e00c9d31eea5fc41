from ladder_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
    shard_state,
)
from ladder_tpu.parallel.tp import (
    leaf_spec,
    make_mesh_2d,
    model_axis_size,
    shard_params_tp,
)

__all__ = [
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "shard_batch",
    "shard_state",
    "leaf_spec",
    "make_mesh_2d",
    "model_axis_size",
    "shard_params_tp",
]
