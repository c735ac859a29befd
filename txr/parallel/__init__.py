from txr.parallel.mesh import (
    make_mesh,
    shard_params,
    param_shardings,
    shard_batch,
    batch_sharding,
    replicated,
)

__all__ = [
    "make_mesh",
    "shard_params",
    "param_shardings",
    "shard_batch",
    "batch_sharding",
    "replicated",
]
