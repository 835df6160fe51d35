from .unet import UNet
from .fused_forward import apply_unet, fused_unet_apply, fused_enabled
from .time_predictor import TimePredictor
from .blocks import (
    TimeEmbedding,
    PositionalEncoding,
    FeatureWiseAffine,
    Block,
    ResnetBlock,
    SelfAttention,
    ResnetBlockWithAttn,
    Downsample,
    Upsample,
)

__all__ = [
    "UNet",
    "apply_unet",
    "fused_unet_apply",
    "fused_enabled",
    "TimePredictor",
    "TimeEmbedding",
    "PositionalEncoding",
    "FeatureWiseAffine",
    "Block",
    "ResnetBlock",
    "SelfAttention",
    "ResnetBlockWithAttn",
    "Downsample",
    "Upsample",
]
