from .mesh import (make_mesh, shard_batch, shard_params, replicate,
                   batch_sharding)

__all__ = ["make_mesh", "shard_batch", "shard_params", "replicate",
           "batch_sharding"]
