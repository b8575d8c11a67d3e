from .mesh import (batch_sharding, candidate_sharding, make_mesh,
                   param_sharding, replicated, shard_batch)

__all__ = ["batch_sharding", "candidate_sharding", "make_mesh",
           "param_sharding", "replicated", "shard_batch"]
