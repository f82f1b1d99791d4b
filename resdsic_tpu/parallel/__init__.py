from .mesh import (
    batch_sharding,
    batch_spec,
    local_batch_slice,
    make_mesh,
    make_multihost_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_multihost_mesh",
    "batch_sharding",
    "batch_spec",
    "local_batch_slice",
    "replicate",
    "shard_batch",
]
