from .quant import ste_round, lower_bound, add_noise
from .shuffle import pixel_shuffle, pixel_unshuffle
from .masks import make_mask_2x, make_mask_4x
from .color import rgb2ycbcr, ycbcr2rgb, ycbcr420_to_444_np, yuv_444_to_420
from .padding import get_padding_size, pad_replicate_nhwc

__all__ = [
    "ste_round", "lower_bound", "add_noise",
    "pixel_shuffle", "pixel_unshuffle",
    "make_mask_2x", "make_mask_4x",
    "rgb2ycbcr", "ycbcr2rgb", "ycbcr420_to_444_np", "yuv_444_to_420",
    "get_padding_size", "pad_replicate_nhwc",
]
