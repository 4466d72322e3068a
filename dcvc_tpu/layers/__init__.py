from .blocks import (
    WSiLU, wsilu, Conv1x1, Conv3x3, DepthwiseConv3x3, DepthConvBlock,
    SubpelConv2x, ResidualBlockUpsample, ResidualBlockWithStride2,
)

__all__ = [
    "WSiLU", "wsilu", "Conv1x1", "Conv3x3", "DepthwiseConv3x3",
    "DepthConvBlock", "SubpelConv2x", "ResidualBlockUpsample",
    "ResidualBlockWithStride2",
]
