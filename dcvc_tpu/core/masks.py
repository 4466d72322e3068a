"""Checkerboard (2x) and quadtree (4x) coding masks, NHWC layout.

Reference: CompressionModel.get_mask_2x / get_mask_4x
(src/models/common_model.py:157-195).  A mask splits the latent into coding
steps; within one step, channel groups are assigned rotated spatial phases.

The reference caches NCHW bool tensors; here masks are built from
broadcasted iota so they can live inside a jitted program as constants
(XLA constant-folds them), with shape (H, W, C) for NHWC broadcasting.
"""

import functools

import numpy as np


@functools.lru_cache(maxsize=64)
def _phase_np(h, w, yo, xo):
    """Boolean (h, w) grid true where (row % 2, col % 2) == (yo, xo)."""
    rows = (np.arange(h) % 2 == yo)[:, None]
    cols = (np.arange(w) % 2 == xo)[None, :]
    return rows & cols


@functools.lru_cache(maxsize=64)
def make_mask_2x(h, w, c):
    """Two checkerboard masks of shape (h, w, c).

    Channel halves use opposite phases; step 1 is the complement.
    Matches get_mask_2x: micro masks ((1,0),(0,1)) and ((0,1),(1,0)).
    """
    assert c % 2 == 0
    m0 = _phase_np(h, w, 0, 0) | _phase_np(h, w, 1, 1)   # ((1,0),(0,1))
    m1 = ~m0                                              # ((0,1),(1,0))
    half = c // 2
    mask_0 = np.concatenate([np.repeat(m0[:, :, None], half, 2),
                             np.repeat(m1[:, :, None], half, 2)], axis=2)
    mask_1 = ~mask_0
    # numpy (not jnp): these are cached; jnp arrays created during a jit
    # trace would leak tracers out of the cache.  numpy bools become
    # XLA constants at each use site.
    return mask_0, mask_1


@functools.lru_cache(maxsize=64)
def make_mask_4x(h, w, c):
    """Four quadtree masks of shape (h, w, c).

    Channel quarters get the four 2x2 phases, rotated per step exactly as
    get_mask_4x: step patterns over channel groups are
      step0: (m0, m1, m2, m3)
      step1: (m3, m2, m1, m0)
      step2: (m2, m3, m0, m1)
      step3: (m1, m0, m3, m2)
    where m0..m3 select the TL, TR, BL, BR pixel of each 2x2 block.
    """
    assert c % 4 == 0
    q = c // 4
    m = [_phase_np(h, w, 0, 0), _phase_np(h, w, 0, 1),
         _phase_np(h, w, 1, 0), _phase_np(h, w, 1, 1)]
    orders = [(0, 1, 2, 3), (3, 2, 1, 0), (2, 3, 0, 1), (1, 0, 3, 2)]
    masks = []
    for order in orders:
        groups = [np.repeat(m[g][:, :, None], q, 2) for g in order]
        masks.append(np.concatenate(groups, axis=2))
    return tuple(masks)
