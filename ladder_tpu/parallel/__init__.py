from ladder_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
    shard_state,
)

__all__ = [
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "shard_batch",
    "shard_state",
]
