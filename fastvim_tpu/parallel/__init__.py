from fastvim_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "get_mesh",
    "make_mesh",
    "replicate",
    "shard_batch",
]
