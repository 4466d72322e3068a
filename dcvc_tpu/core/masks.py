"""Checkerboard (2x) and quadtree (4x) coding masks, NHWC layout.

Reference: CompressionModel.get_mask_2x / get_mask_4x
(src/models/common_model.py:157-195).  A mask splits the latent into coding
steps; within one step, channel groups are assigned rotated spatial phases.

The reference caches NCHW bool tensors; here masks are built from
broadcasted iota so they can live inside a jitted program as constants
(XLA constant-folds them), with shape (H, W, C) for NHWC broadcasting.
"""

import functools

import jax.numpy as jnp
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


# --------------------------------------------------------------------------
# Candidate-domain phase terms.
#
# Every mask above is a union of (2x2 spatial phase) x (channel range)
# terms, so "the positions of mask k" form a REGULAR subgrid: extracting
# them is strided slicing and re-inserting them is a 2x2 pixel-shuffle —
# both XLA-friendly, unlike the gathers/scatters a flat boolean mask
# needs.  The inference runtimes quantize/entropy-code in this packed
# "candidate domain": (1, H/2, W/2, sum-of-term-channels).

_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def phase_terms_4x(c):
    """Per step: list of ((yo, xo), ch_lo, ch_hi) terms matching
    make_mask_4x.  Candidate shape per step: (1, h/2, w/2, c)."""
    assert c % 4 == 0
    q = c // 4
    orders = [(0, 1, 2, 3), (3, 2, 1, 0), (2, 3, 0, 1), (1, 0, 3, 2)]
    return [
        [(_PHASES[order[g]], g * q, (g + 1) * q) for g in range(4)]
        for order in orders
    ]


def phase_terms_2x(c):
    """Per step: terms matching make_mask_2x.  Each channel half has two
    phases; candidate shape per step: (1, h/2, w/2, 2c)."""
    assert c % 2 == 0
    half = c // 2
    t0 = [((0, 0), 0, half), ((1, 1), 0, half),
          ((0, 1), half, c), ((1, 0), half, c)]
    t1 = [((0, 1), 0, half), ((1, 0), 0, half),
          ((0, 0), half, c), ((1, 1), half, c)]
    return [t0, t1]


def phase_unshuffle(x):
    """Phase-major space-to-depth: (b, h, w, c) -> (b, ⌈h/2⌉, ⌈w/2⌉, 4c)
    with output channel (yy*2 + xx)*c + ch.  Unlike stride-2 spatial
    slicing (a full relayout per phase, ~13 ms at 1080p latent sizes),
    this is one transpose XLA lowers efficiently, and each phase becomes
    a contiguous lane-aligned channel slice.

    Odd grids (the reference pads frames to 16, so latent grids at e.g.
    720p/2160p are odd, common_model.py:95-100): the grid is zero-padded
    to even; the padded lanes are excluded from coding by phase_valid()
    and cropped away by phase_merge(), so they never influence symbols
    or reconstruction."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        h, w = h + h % 2, w + w % 2
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def phase_split(x, terms):
    """(1, h, w, c) -> candidate (1, h/2, w/2, sum(hi-lo)): each term's
    phase subgrid, concatenated in term order.  Routed through ONE
    phase-major unshuffle + channel slices; multiple splits of the same
    tensor inside one jitted program share the unshuffle via CSE."""
    c = x.shape[-1]
    u = phase_unshuffle(x)
    parts = [u[..., (yo * 2 + xo) * c + lo:(yo * 2 + xo) * c + hi]
             for ((yo, xo), lo, hi) in terms]
    return jnp.concatenate(parts, axis=-1)


def phase_merge(xc, terms, c, out_h=None, out_w=None):
    """Inverse of phase_split: scatter candidate channels back to their
    (phase, channel-range) positions of the full (1, h, w, c) grid;
    positions not covered by any term are zero.  out_h/out_w crop the
    merged grid back to an odd size (the zero-padded candidate lanes)."""
    h2, w2 = xc.shape[1], xc.shape[2]
    # regroup terms by channel range (2x masks have 2 phases per range)
    by_range = {}
    off = 0
    order = []
    for (ph, lo, hi) in terms:
        if (lo, hi) not in by_range:
            by_range[(lo, hi)] = {}
            order.append((lo, hi))
        by_range[(lo, hi)][ph] = xc[..., off:off + (hi - lo)]
        off += hi - lo
    assert sorted(order) == order and order[0][0] == 0 and order[-1][1] == c
    outs = []
    for (lo, hi) in order:
        phases = by_range[(lo, hi)]
        z = None
        grid = []
        for yy in (0, 1):
            row = []
            for xx in (0, 1):
                v = phases.get((yy, xx))
                if v is None:
                    if z is None:
                        z = jnp.zeros((1, h2, w2, hi - lo),
                                      next(iter(phases.values())).dtype)
                    v = z
                row.append(v)
            grid.append(row)
        t = jnp.stack([jnp.stack(grid[0], axis=3),
                       jnp.stack(grid[1], axis=3)], axis=2)
        outs.append(t.reshape(1, 2 * h2, 2 * w2, hi - lo))
    out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    if out_h is not None and (out_h != 2 * h2 or out_w != 2 * w2):
        out = out[:, :out_h, :out_w, :]
    return out


@functools.lru_cache(maxsize=256)
def phase_valid(h, w, terms_key):
    """Flat bool (numpy) over the candidate domain of phase_split(x,
    terms) on an (h, w) grid: True where the candidate maps to a real
    grid position, False on the zero-padded even-ing row/col.  terms_key
    must be the tuple(terms) of the matching phase_split call.

    The runtimes AND this into the coding condition so odd grids emit
    exactly the reference's symbol set (mask generation at arbitrary
    sizes, common_model.py:95-100 crops the repeated micro mask to
    [:H, :W])."""
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    cols = []
    for ((yo, xo), lo, hi) in terms_key:
        vr = (yo + 2 * np.arange(h2)) < h
        vc = (xo + 2 * np.arange(w2)) < w
        v = vr[:, None] & vc[None, :]
        cols.append(np.repeat(v[:, :, None], hi - lo, 2))
    return np.concatenate(cols, axis=2).reshape(-1)


def terms_key(terms):
    """Hashable form of a phase-terms list (for phase_valid's cache)."""
    return tuple((tuple(ph), lo, hi) for (ph, lo, hi) in terms)
