"""Gaussian conditional entropy model for y latents.

Reference: GaussianEncoder (src/models/entropy_models.py:152-217) and the
scale_to_index device mapping (def_const.h:6-12, elementwise/stream.cu).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.quant import lower_bound

SCALE_MIN = 0.11
SCALE_MAX = 16.0
SCALE_LEVEL = 128
# The reference device kernels bake slightly-rounded log constants
# (def_const.h): keep them identical for stream-level conformance.
LOG_SCALE_MIN = -2.2073
LOG_SCALE_MAX = 2.7726
LOG_SCALE_STEP = (LOG_SCALE_MAX - LOG_SCALE_MIN) / (SCALE_LEVEL - 1)


def get_scale_table():
    """128 log-spaced scales in [0.11, 16] (exact log endpoints, like the
    Python-side GaussianEncoder.get_scale_table used to build CDFs)."""
    return np.exp(np.linspace(math.log(SCALE_MIN), math.log(SCALE_MAX),
                              SCALE_LEVEL)).astype(np.float32)


def scale_to_index(scale):
    """Map a scale tensor to its CDF index in the 128-level log grid.

    Mirrors the device kernel (stream.cu scale_to_index + to_uint8 floor):
    clamp to [SCALE_MIN, SCALE_MAX], then floor((log s - logmin) / step).
    Computed in f32; returns int32 in [0, 127].
    """
    s = jnp.clip(scale.astype(jnp.float32), SCALE_MIN, SCALE_MAX)
    idx = (jnp.log(s) - LOG_SCALE_MIN) * (1.0 / LOG_SCALE_STEP)
    idx = jnp.floor(idx).astype(jnp.int32)
    return jnp.clip(idx, 0, SCALE_LEVEL - 1)


def gaussian_prob_train(values, scales):
    """Training-time probability of quantized residuals under N(0, scale).

    Matches GaussianEncoder.get_prob_train: erfc formulation, f32 internal,
    scale lower-bounded at 0.11, probability clamped at 1e-9.
    """
    dtype = values.dtype
    values = values.astype(jnp.float32)
    scales = scales.astype(jnp.float32)
    scales = lower_bound(scales, SCALE_MIN)
    values = jnp.abs(values)
    const = -(2.0 ** -0.5)
    upper = jax.scipy.special.erfc(const * ((0.5 - values) / scales))
    lower = jax.scipy.special.erfc(const * ((-0.5 - values) / scales))
    prob = jnp.maximum(0.5 * (upper - lower), 1e-9)
    return prob.astype(dtype)


PROB_TO_BITS = -1.0 / math.log(2.0)


def probs_to_bits(probs):
    """-log2(p), lower-bounded (reference CompressionModel.probs_to_bits)."""
    dtype = probs.dtype
    probs = probs.astype(jnp.float32)
    bits = jnp.log(lower_bound(probs, 1e-6)) * PROB_TO_BITS
    bits = lower_bound(bits, 0.0)
    return bits.astype(dtype)


class GaussianConditional:
    """Stateless helper bundling the scale table and CDF bank builder."""

    def __init__(self, skip_thres=0.0):
        self.skip_thres = skip_thres
        self.scale_table = get_scale_table()

    def compute_cdf_bank(self):
        """128-level y CDF bank (GaussianEncoder.update, entropy_models.py:184-217)."""
        from .cdf import pmf_to_cdf, MAX_ENTROPY_CODING_VALUE
        from scipy.stats import norm

        mx = MAX_ENTROPY_CODING_VALUE
        scales = self.scale_table.astype(np.float64)      # (128,)
        sym_range = np.full(SCALE_LEVEL, mx, np.int32)
        for i in range(mx, 1, -1):
            probs = norm.cdf(i, loc=0.0, scale=scales)
            sym_range = np.where(probs > 0.999, i, sym_range)

        pmf_length = 2 * sym_range + 1
        max_length = 2 * mx + 1
        samples = (np.arange(max_length)[None, :] - sym_range[:, None]).astype(np.float64)
        upper = norm.cdf(samples + 0.5, loc=0.0, scale=scales[:, None])
        lower = norm.cdf(samples - 0.5, loc=0.0, scale=scales[:, None])
        pmf = (upper - lower).astype(np.float32)
        tail_mass = (2 * lower[:, :1]).astype(np.float32)

        quantized_cdf = pmf_to_cdf(pmf, tail_mass, pmf_length, max_length)
        cdf_length = (pmf_length + 2).astype(np.int32)
        return quantized_cdf, cdf_length
