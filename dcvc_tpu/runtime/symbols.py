"""Sort-based symbol compaction for the inference runtimes.

The reference compacts coded symbols with block-scan + scatter CUDA
kernels (conditional_index_part1/2, elementwise/stream.cu:176-358) and
scatters decoded symbols back (conditional_recover).  On TPU, arbitrary
scatter/gather over millions of elements is the slowest primitive in the
whole codec (~60-70 ms at 1080p), while XLA's variadic stable sort is
near bandwidth-bound.  So:

  * compaction = ONE stable sort keyed on not-coded, carrying the symbol
    payloads plus the original positions (iota);
  * expansion  = ONE sort keyed on those carried positions, with the
    (zero-padded) decoded buffer as payload: position j's payload lands
    at its original grid slot, skipped slots receive the zero padding.

Both sides run in the quarter-size candidate domain (core/masks.py
phase_terms_*), so a 1080p step sorts ~0.5M elements (~1 ms).
"""

import jax
import jax.numpy as jnp


def compact_idx(idx_u8, cond):
    """Compact CDF indexes + original positions.

    idx_u8, cond: flat (N,).  Returns (packed_idx u8, packed_pos i32,
    count i32): the first `count` entries of packed_idx are the coded
    symbols' indexes in stable order; packed_pos[j] is entry j's original
    position (for ALL j, coded then skipped, stable)."""
    n = cond.shape[0]
    key = (~cond).astype(jnp.uint8)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    _, packed_idx, packed_pos = jax.lax.sort(
        (key, idx_u8, iota), num_keys=1, is_stable=True)
    count = jnp.sum(cond, dtype=jnp.int32)
    return packed_idx, packed_pos, count


def compact_vals(vals, cond):
    """Compact a value buffer (same stable order as compact_idx)."""
    key = (~cond).astype(jnp.uint8)
    _, packed = jax.lax.sort((key, vals), num_keys=1, is_stable=True)
    return packed


def expand_from_pos(packed_pos, padded, n):
    """Scatter decoded symbols back to the candidate grid.

    packed_pos: (N,) permutation from compact_idx.  padded: (cap,) int8,
    decoded symbols in entries [0, count), zeros after.  Returns flat
    (N,) with decoded values at coded positions, zero elsewhere."""
    cap = padded.shape[0]
    if cap < n:
        padded = jnp.concatenate(
            [padded, jnp.zeros((n - cap,), padded.dtype)])
    elif cap > n:
        padded = padded[:n]
    _, dense = jax.lax.sort((packed_pos, padded), num_keys=1,
                            is_stable=False)
    return dense


def quantize_candidate(y_c, means_c, cond):
    """Encoder-side candidate-domain quantization: round residual, zero
    where not coded, clamp to int8 (stream.cu:549-686 semantics).
    y_c, means_c: (1, h2, w2, C); cond: flat (N,)."""
    y_res = y_c.astype(jnp.float32) - means_c
    y_q = jnp.round(y_res)
    y_q = jnp.where(cond.reshape(y_q.shape), y_q, 0.0)
    y_q = jnp.clip(y_q, -128.0, 127.0)
    return y_q.astype(jnp.int8)
