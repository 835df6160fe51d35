from .groupnorm import fused_group_norm_swish, group_norm_swish_reference
from .attention import fused_attention, attention_reference

__all__ = [
    "fused_group_norm_swish",
    "group_norm_swish_reference",
    "fused_attention",
    "attention_reference",
]
