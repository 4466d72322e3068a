"""Padding helpers (reference CompressionModel.get_padding_size and the
replicate_pad device kernel, elementwise/cat_and_pad.cu)."""

import jax.numpy as jnp


def get_padding_size(height, width, p=64):
    """Right/bottom padding that rounds H, W up to a multiple of p."""
    new_h = (height + p - 1) // p * p
    new_w = (width + p - 1) // p * p
    return new_w - width, new_h - height  # (padding_right, padding_bottom)


def pad_replicate_nhwc(x, pad_b, pad_r):
    """Edge-replicate pad on the bottom/right of an NHWC tensor."""
    if pad_b == 0 and pad_r == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)), mode="edge")


def pad_for_y(y, p=4):
    """Replicate-pad an odd/unaligned latent up to a multiple of `p`
    before the stride-2 hyper path (reference DMCCommon::pad_for_y,
    dmc_common.cpp:73-82: frames pad to 16 so the y grid may be odd;
    only the hyper transforms need 4-alignment, and their output is
    cropped back to the odd grid)."""
    pad_r, pad_b = get_padding_size(y.shape[1], y.shape[2], p)
    return pad_replicate_nhwc(y, pad_b, pad_r)
