from .attention import spatial_attention, mha_attention

__all__ = ["spatial_attention", "mha_attention"]
