"""Pixel shuffle / unshuffle on NHWC layout.

TPU-native layout is NHWC (channels-last, lane dimension = channels).  The
channel ordering matches torch's NCHW pixel_(un)shuffle so that imported
reference checkpoints (src/models/*.py use F.pixel_unshuffle/F.pixel_shuffle)
produce identical tensors up to layout permutation: output channel index for
unshuffle(r) is c*r*r + i*r + j.
"""

import jax.numpy as jnp


def pixel_unshuffle(x, r):
    """(B, H*r, W*r, C) -> (B, H, W, C*r*r)."""
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H, W, C, r, r)
    return x.reshape(b, h, w, c * r * r)


def pixel_shuffle(x, r):
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, r, W, r, C)
    return x.reshape(b, h * r, w * r, c)
