from .unet import UNet
from .forward_utils import apply_unet, fused_enabled
from .precision import cast_unet_params_for_inference
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
    "fused_enabled",
    "cast_unet_params_for_inference",
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
