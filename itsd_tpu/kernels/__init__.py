from .attention import spatial_attention, mha_attention
from .ring_attention import (attention_with_stats, ring_attention,
                             sequence_sharded_attention)

__all__ = ["spatial_attention", "mha_attention", "attention_with_stats",
           "ring_attention", "sequence_sharded_attention"]
