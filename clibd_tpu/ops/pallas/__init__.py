from .attention import fused_mha

__all__ = ["fused_mha"]
