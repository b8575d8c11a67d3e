from .mesh import (batch_sharding, candidate_sharding, make_mesh,
                   maybe_initialize_distributed, param_sharding, replicated,
                   shard_batch)

__all__ = ["batch_sharding", "candidate_sharding", "make_mesh",
           "maybe_initialize_distributed", "param_sharding", "replicated",
           "shard_batch"]
