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
