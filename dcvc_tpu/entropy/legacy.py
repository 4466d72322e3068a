"""Entropy-model banks for the legacy DCVC family (indexed-rANS mode).

The pre-UF models (DCVC/TCM/HEM/DC/FM/EVC) code DENSE symbol grids
through CompressAI-lineage CDF groups: per-symbol CDF row index and
per-row integer offset (reference DCVC-family/DCVC-FM/src/models/
entropy_models.py).  Unlike the UF banks (entropy/cdf.py), rows are in
natural value order (no zig-zag reorder) and carry an explicit offset.

Two bank builders:
  * LegacyGaussianTable — 256-level log-spaced scale table for y/mv
    symbols, gaussian or laplace CDFs (GaussianEncoder.update,
    entropy_models.py:225-287).
  * legacy_bitparm_bank — factorized-prior rows per (qp, channel) for z
    symbols (BitEstimator.update, entropy_models.py:141-199).
"""

import math

import numpy as np

from .cdf import pmf_to_quantized_cdf


def _pmf_to_cdf_plain(pmf, tail_mass, pmf_length, max_length):
    """Batched CDF build in natural value order (EntropyCoder.pmf_to_cdf,
    entropy_models.py:25-32): no zig-zag reorder."""
    pmf = np.asarray(pmf, np.float32)
    tail_mass = np.asarray(tail_mass, np.float32).reshape(-1, 1)
    pmf_length = np.asarray(pmf_length).reshape(-1)
    n = pmf.shape[0]
    cdf = np.zeros((n, max_length + 2), dtype=np.int32)
    for i in range(n):
        prob = np.concatenate([pmf[i, :pmf_length[i]], tail_mass[i]])
        row = pmf_to_quantized_cdf(prob)
        cdf[i, :row.shape[0]] = row
    return cdf


def _norm_cdf(x, scale):
    from scipy.special import erf
    return 0.5 * (1.0 + erf(x / (scale * math.sqrt(2.0))))


def _laplace_cdf(x, scale):
    return 0.5 - 0.5 * np.sign(x) * np.expm1(-np.abs(x) / scale)


class LegacyGaussianTable:
    """256-level log-spaced scale table -> quantized CDF rows + offsets.

    distribution: 'laplace' (FM) or 'gaussian' (HEM/DC/TCM/EVC).
    """

    def __init__(self, distribution="gaussian"):
        assert distribution in ("gaussian", "laplace")
        self.distribution = distribution
        if distribution == "laplace":
            self.scale_min, self.scale_max, self.levels = 0.01, 64.0, 256
            self._cdf = _laplace_cdf
        else:
            self.scale_min, self.scale_max, self.levels = 0.11, 64.0, 256
            self._cdf = _norm_cdf
        self.log_scale_min = math.log(self.scale_min)
        self.log_scale_max = math.log(self.scale_max)
        self.log_scale_step = ((self.log_scale_max - self.log_scale_min)
                               / (self.levels - 1))
        self.scale_table = np.exp(np.linspace(
            self.log_scale_min, self.log_scale_max, self.levels))

    def compute_cdf_bank(self):
        """-> (quantized_cdf (levels, L+2) i32, cdf_length i32, offset i32)."""
        scales = self.scale_table
        pmf_center = np.full(self.levels, 50, np.int32)
        for i in range(50, 1, -1):
            probs = self._cdf(np.full_like(scales, float(i)), scales)
            pmf_center = np.where(probs > 0.9999, i, pmf_center)
        pmf_length = 2 * pmf_center + 1
        max_length = int(pmf_length.max())

        samples = (np.arange(max_length, dtype=np.float32)[None, :]
                   - pmf_center[:, None]).astype(np.float32)
        upper = self._cdf(samples + 0.5, scales[:, None])
        lower = self._cdf(samples - 0.5, scales[:, None])
        pmf = upper - lower
        tail_mass = 2 * lower[:, :1]
        cdf = _pmf_to_cdf_plain(pmf, tail_mass, pmf_length, max_length)
        return cdf, (pmf_length + 2).astype(np.int32), (-pmf_center).astype(np.int32)

    def build_indexes_np(self, scales):
        """Host-side scale -> table index (build_indexes,
        entropy_models.py:288-292): truncating int conversion."""
        scales = np.maximum(np.asarray(scales, np.float32), 1e-5)
        idx = (np.log(scales) - self.log_scale_min) / self.log_scale_step
        return np.clip(idx, 0, self.levels - 1).astype(np.int32)

    def build_indexes(self, scales):
        """Device-side variant (jnp), truncation-compatible."""
        import jax.numpy as jnp
        scales = jnp.maximum(scales.astype(jnp.float32), 1e-5)
        idx = (jnp.log(scales) - self.log_scale_min) / self.log_scale_step
        return jnp.clip(idx, 0, self.levels - 1).astype(jnp.int32)


def legacy_bitparm_bank(params, qp_num, channel):
    """Factorized-prior CDF bank in legacy (offset) form.

    params: {h, b: (Q, C, 4), a: (Q, C, 3)} (entropy/bit_estimator.py).
    Mirrors BitEstimator.update (entropy_models.py:141-199): asymmetric
    [−minima, maxima] support, thresholds 1e-4 / 1 − 1e-4, offset=−minima.
    Row index = qp * channel + ch.
    -> (quantized_cdf i32, cdf_length i32, offset i32)
    """
    h = np.asarray(params["h"], np.float32)
    b = np.asarray(params["b"], np.float32)
    a = np.asarray(params["a"], np.float32)
    Q, C = h.shape[:2]
    assert (Q, C) == (qp_num, channel)

    def cdf_net(x):  # x: (Q, C, N)
        x = x.astype(np.float32)
        for i in range(4):
            sp = np.logaddexp(0.0, h[:, :, i:i + 1]).astype(np.float32)
            x = x * sp + b[:, :, i:i + 1]
            if i != 3:
                x = x + np.tanh(x) * np.tanh(a[:, :, i:i + 1])
        return 1.0 / (1.0 + np.exp(-x))

    zeros = np.zeros((Q, C, 1), np.float32)
    minima = np.full((Q, C, 1), 50, np.int32)
    maxima = np.full((Q, C, 1), 50, np.int32)
    for i in range(50, 1, -1):
        lo = cdf_net(zeros - i)
        minima = np.where(lo < 1e-4, i, minima)
        hi = cdf_net(zeros + i)
        maxima = np.where(hi > 1.0 - 1e-4, i, maxima)

    offset = -minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())
    samples = (np.arange(max_length, dtype=np.float32)[None, None, :]
               - minima.astype(np.float32))
    lower = cdf_net(samples - 0.5)
    upper = cdf_net(samples + 0.5)
    pmf = upper - lower
    tail_mass = lower[:, :, :1] + (1.0 - upper[:, :, -1:])

    cdf = _pmf_to_cdf_plain(pmf.reshape(-1, max_length),
                            tail_mass.reshape(-1, 1),
                            pmf_length.reshape(-1), max_length)
    return (cdf, (pmf_length.reshape(-1) + 2).astype(np.int32),
            offset.reshape(-1).astype(np.int32))


def build_z_indexes(qp, channel, zh, zw):
    """CHW-order per-channel CDF indexes for a z grid
    (BitEstimator.build_indexes, entropy_models.py:201-204)."""
    idx = np.arange(channel, dtype=np.int16) + qp * channel
    return np.repeat(idx, zh * zw)
