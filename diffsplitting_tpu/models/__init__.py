from .unet import UNet
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
