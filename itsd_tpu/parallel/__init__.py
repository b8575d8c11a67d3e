from .mesh import (batch_sharding, candidate_sharding, default_seq_mesh,
                   get_seq_mesh, make_mesh, maybe_initialize_distributed,
                   param_sharding, replicated, seq_mesh_scope, set_seq_mesh,
                   shard_batch, spatial_sharding)

__all__ = ["batch_sharding", "candidate_sharding", "default_seq_mesh",
           "get_seq_mesh", "make_mesh", "maybe_initialize_distributed",
           "param_sharding", "replicated", "seq_mesh_scope", "set_seq_mesh",
           "shard_batch", "spatial_sharding"]
