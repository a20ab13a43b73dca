from .attention import flash_attention_qkv, flash_attention_qkv_outproj
from .mlp import fused_mlp

__all__ = ["flash_attention_qkv", "flash_attention_qkv_outproj",
           "fused_mlp"]
