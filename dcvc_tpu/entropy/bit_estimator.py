"""Factorized (hyper-)prior over z: a 4-layer monotone MLP per (qp, channel).

Reference: BitEstimator + bit_estimator_z_prob/_fwd
(src/models/entropy_models.py:78-149, src/layers/layers.py:13-31).

Parameters are pytrees {h: (Q, C, 4), b: (Q, C, 4), a: (Q, C, 3)}; the
forward works on NHWC tensors with per-layer params broadcast over the
trailing channel dim.
"""

import jax
import jax.numpy as jnp
import numpy as np


def bit_estimator_z_prob(x, h, b, a):
    """Accumulated probability (monotone CDF network).

    x: (..., C); h, b: broadcastable (..., C, 4); a: (..., C, 3).
    """
    for i in range(4):
        x = x * jax.nn.softplus(h[..., i]) + b[..., i]
        if i != 3:
            x = x + jnp.tanh(x) * jnp.tanh(a[..., i])
    return jax.nn.sigmoid(x)


def bit_estimator_z_fwd(x, h, b, a):
    """P(round(z)=x) = CDF(x+0.5) - CDF(x-0.5), computed in f32."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    h = h.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a = a.astype(jnp.float32)
    lower = bit_estimator_z_prob(x - 0.5, h, b, a)
    upper = bit_estimator_z_prob(x + 0.5, h, b, a)
    return (upper - lower).astype(dtype)


class BitEstimator:
    """Functional container around the (h, b, a) parameter bank."""

    def __init__(self, qp_num, channel):
        self.qp_num = qp_num
        self.channel = channel

    def init_params(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        shape_hb = (self.qp_num, self.channel, 4)
        shape_a = (self.qp_num, self.channel, 3)
        return {
            "h": 0.01 * jax.random.normal(k1, shape_hb, jnp.float32),
            "b": 0.01 * jax.random.normal(k2, shape_hb, jnp.float32),
            "a": 0.01 * jax.random.normal(k3, shape_a, jnp.float32),
        }

    @staticmethod
    def select_qp(params, qp):
        """Select per-qp parameter slices.

        qp: int or int array (B,) -> params broadcastable against NHWC x:
        h, b: (B, 1, 1, C, 4); a: (B, 1, 1, C, 3).
        """
        h = jnp.take(params["h"], qp, axis=0)
        b = jnp.take(params["b"], qp, axis=0)
        a = jnp.take(params["a"], qp, axis=0)
        if h.ndim == 2:  # scalar qp keeps (C, 4/3), broadcasts over NHWC
            return h, b, a
        # per-sample qp: (B, C, k) -> (B, 1, 1, C, k)
        return (h[:, None, None], b[:, None, None], a[:, None, None])

    def get_prob(self, params, x, qp):
        """x: (B, H, W, C) NHWC, qp: int or (B,) -> per-element probability."""
        h, b, a = self.select_qp(params, qp)
        return bit_estimator_z_fwd(x, h, b, a)

    def compute_cdf_bank(self, params, max_value):
        """Build the quantized CDF bank for all (qp, channel) pairs.

        Returns (quantized_cdf (Q*C, max_len+2) int32, cdf_length (Q*C,) int32)
        mirroring BitEstimator.update (entropy_models.py:113-149).
        Offline path: numpy + float64-free, deterministic.
        """
        from .cdf import pmf_to_cdf, MAX_ENTROPY_CODING_VALUE

        h = np.asarray(params["h"], np.float32)  # (Q, C, 4)
        b = np.asarray(params["b"], np.float32)
        a = np.asarray(params["a"], np.float32)
        Q, C = h.shape[:2]

        def cdf_net(x):  # x: (Q, C, N)
            x = x.astype(np.float32)
            for i in range(4):
                sp = np.logaddexp(0.0, h[:, :, i:i + 1]).astype(np.float32)
                x = x * sp + b[:, :, i:i + 1]
                if i != 3:
                    x = x + np.tanh(x) * np.tanh(a[:, :, i:i + 1])
            return 1.0 / (1.0 + np.exp(-x))

        mx = MAX_ENTROPY_CODING_VALUE
        zeros = np.zeros((Q, C, 1), np.float32)
        sym_range = np.full((Q, C, 1), mx, np.int32)
        for i in range(mx, 1, -1):
            neg = cdf_net(zeros - i)
            pos = cdf_net(zeros + i)
            sym_range = np.where((neg < 0.001) & (pos > 0.999), i, sym_range)

        pmf_length = sym_range * 2 + 1                      # (Q, C, 1)
        max_length = mx * 2 + 1
        samples = np.arange(max_length, dtype=np.float32)[None, None, :] - sym_range
        lower = cdf_net(samples - 0.5)
        upper = cdf_net(samples + 0.5)
        pmf = upper - lower                                 # (Q, C, L)
        up_at_range = cdf_net(sym_range.astype(np.float32))
        tail_mass = lower[:, :, :1] + (1.0 - up_at_range[:, :, -1:])

        pmf = pmf.reshape(-1, max_length)
        tail_mass = tail_mass.reshape(-1, 1)
        pmf_length = pmf_length.reshape(-1)
        quantized_cdf = pmf_to_cdf(pmf, tail_mass, pmf_length, max_length)
        cdf_length = pmf_length + 2
        return quantized_cdf, cdf_length.astype(np.int32)
