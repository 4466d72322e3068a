"""Packed-frame emission: 8x depth-to-space + clip into lane-wide
packed-RGB rows.

The recon heads produce (F, h8, w8, 192) features whose channels hold an
8x8 spatial block x RGB.  Two layout decisions make the emission fast
(~1.6 ms vs ~11 ms for the naive pixel-shuffle chain at 1080p):

  * channels are made PHASE-MAJOR — channel = (i*8 + j)*3 + c — by
    permuting the head's 1x1 OUTPUT WEIGHTS (phase_major_perm, a free
    gather on a (F, 256, 192) weight tensor), never the activations;
  * each block row i is then a contiguous 24-channel slice that
    reshapes to one packed output row: 8 slices + 1 concat, no
    transpose of a 3-wide minor dim.

A hand-written Mosaic kernel for this is blocked on lane-merging
reshapes (tpu.reshape (th, w8, 24) -> (th, 1, w8*24) is an unsupported
shape cast as of this toolchain); the slice+concat XLA formulation is
within ~3x of the memory-bound roofline, which is enough — this op is
no longer on the critical path.
"""

import jax.numpy as jnp
import numpy as np


def phase_major_perm(r=8, c=3):
    """perm such that w[..., perm] converts torch pixel-shuffle channel
    order (ch*r*r + i*r + j) to phase-major ((i*r + j)*c + ch)."""
    perm = np.empty(r * r * c, np.int32)
    k = 0
    for i in range(r):
        for j in range(r):
            for ch in range(c):
                perm[k] = ch * r * r + i * r + j
                k += 1
    return perm


def packed_frames(heads, r=8, c=3):
    """(F, h8, w8, r*r*c) PHASE-MAJOR head outputs -> (F, h8*r, w8*r*c)
    f32 packed rows, clipped to [-0.5, 0.5]."""
    nf, h8, w8, ch = heads.shape
    assert ch == r * r * c
    rc = r * c
    parts = [heads[:, :, :, i * rc:(i + 1) * rc].reshape(nf, h8, 1, w8 * rc)
             for i in range(r)]
    x = jnp.concatenate(parts, axis=2).reshape(nf, h8 * r, w8 * rc)
    return jnp.clip(x.astype(jnp.float32), -0.5, 0.5)


def packed_frames_reference(heads, r=8, c=3):
    """Transpose-based reference implementation (validation)."""
    nf, h8, w8, ch = heads.shape
    x = heads.reshape(nf, h8, w8, r, r * c)
    x = x.transpose(0, 1, 3, 2, 4)
    x = x.reshape(nf, h8 * r, w8 * r * c)
    return jnp.clip(x.astype(jnp.float32), -0.5, 0.5)
