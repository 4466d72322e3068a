"""Golden tests for entropy-model math vs reference formulas (recomputed
with torch as an independent oracle)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dcvc_tpu.entropy import (
    BitEstimator, bit_estimator_z_fwd, gaussian_prob_train, probs_to_bits,
    get_scale_table, scale_to_index, pmf_to_quantized_cdf, reorder_prob,
    GaussianConditional, SCALE_LEVEL,
)


def torch_z_prob(x, h, b, a):
    # reference bit_estimator_z_prob (layers.py:13-19), NCHW convention
    for i in range(4):
        x = x * F.softplus(h[:, :, i:i + 1, None]) + b[:, :, i:i + 1, None]
        if i != 3:
            x = x + torch.tanh(x) * torch.tanh(a[:, :, i:i + 1, None])
    return torch.sigmoid(x)


class TestBitEstimator:
    def test_prob_matches_torch(self):
        rng = np.random.default_rng(0)
        Q, C, H, W = 4, 6, 3, 5
        h = rng.normal(0, 0.01, (Q, C, 4)).astype(np.float32)
        b = rng.normal(0, 0.01, (Q, C, 4)).astype(np.float32)
        a = rng.normal(0, 0.01, (Q, C, 3)).astype(np.float32)
        x = rng.normal(0, 2, (1, H, W, C)).astype(np.float32)
        qp = 2

        params = {"h": jnp.asarray(h), "b": jnp.asarray(b), "a": jnp.asarray(a)}
        be = BitEstimator(Q, C)
        got = np.asarray(be.get_prob(params, jnp.asarray(x), qp))

        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ht = torch.from_numpy(h[qp:qp + 1])
        bt = torch.from_numpy(b[qp:qp + 1])
        at = torch.from_numpy(a[qp:qp + 1])
        lower = torch_z_prob(xt - 0.5, ht, bt, at)
        upper = torch_z_prob(xt + 0.5, ht, bt, at)
        want = np.transpose((upper - lower).numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    def test_cdf_bank_shapes_and_validity(self):
        be = BitEstimator(qp_num=2, channel=3)
        params = be.init_params(jax.random.PRNGKey(0))
        cdf, lengths = be.compute_cdf_bank(params, 8)
        assert cdf.shape == (6, 19)
        assert lengths.shape == (6,)
        for i in range(6):
            n = lengths[i]
            row = cdf[i, :n]
            assert row[0] == 0 and row[n - 1] == 65536
            assert np.all(np.diff(row) > 0)


class TestGaussian:
    def test_prob_train_matches_reference_formula(self):
        rng = np.random.default_rng(1)
        v = rng.normal(0, 2, (2, 4, 4, 3)).astype(np.float32)
        s = rng.uniform(0.01, 4.0, (2, 4, 4, 3)).astype(np.float32)
        got = np.asarray(gaussian_prob_train(jnp.asarray(v), jnp.asarray(s)))

        vt = torch.from_numpy(v).abs()
        st = torch.clamp_min(torch.from_numpy(s), 0.11)
        const = float(-(2 ** -0.5))
        upper = torch.erfc(const * ((0.5 - vt) / st))
        lower = torch.erfc(const * ((-0.5 - vt) / st))
        want = torch.clamp_min(0.5 * (upper - lower), 1e-9).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)

    def test_probs_to_bits(self):
        p = jnp.array([1.0, 0.5, 1e-9])
        bits = np.asarray(probs_to_bits(p))
        assert bits[0] == 0.0
        np.testing.assert_allclose(bits[1], 1.0, rtol=1e-6)
        np.testing.assert_allclose(bits[2], -math.log2(1e-6), rtol=1e-5)

    def test_scale_table_matches_reference(self):
        want = torch.exp(torch.linspace(math.log(0.11), math.log(16.0), 128)).numpy()
        np.testing.assert_allclose(get_scale_table(), want, rtol=1e-6)

    def test_scale_to_index_bounds(self):
        s = jnp.array([0.0, 0.11, 16.0, 100.0, 1.0])
        idx = np.asarray(scale_to_index(s))
        assert idx[0] == 0 and idx[1] == 0
        # log(16) = 2.77259 sits just below the reference's rounded
        # LOG_SCALE_MAX constant (2.7726), so the floor-index is 126.
        assert idx[2] == 126 and idx[3] == idx[2]
        assert 0 < idx[4] < 127

    def test_scale_to_index_consistent_with_table(self):
        # the floor-index must never pick a table scale > the true scale
        # by more than one step
        table = get_scale_table()
        s = jnp.asarray(table * 1.0001)
        idx = np.asarray(scale_to_index(s))
        assert np.all(np.abs(idx - np.arange(128)) <= 1)

    def test_y_cdf_bank(self):
        g = GaussianConditional()
        cdf, lengths = g.compute_cdf_bank()
        assert cdf.shape == (SCALE_LEVEL, 19)
        for i in range(SCALE_LEVEL):
            n = lengths[i]
            row = cdf[i, :n]
            assert row[0] == 0 and row[n - 1] == 65536
            assert np.all(np.diff(row) > 0)


class TestCdfQuantization:
    def test_reorder_prob(self):
        # symmetric pmf over [-2..2] + tail
        prob = np.array([0.05, 0.2, 0.5, 0.2, 0.05, 0.01], np.float32)
        got = reorder_prob(prob)
        want = np.array([0.5, 0.2, 0.2, 0.05, 0.05, 0.01], np.float32)
        np.testing.assert_array_equal(got, want)

    def test_quantized_cdf_properties(self):
        pmf = [0.5, 0.2, 0.2, 0.05, 0.04, 0.01]
        cdf = pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0 and cdf[-1] == 65536
        assert np.all(np.diff(cdf) >= 1)

    def test_quantized_cdf_min_freq_stealing(self):
        # a zero-probability symbol must still get frequency >= 1
        pmf = [0.7, 0.0, 0.3]
        cdf = pmf_to_quantized_cdf(pmf)
        assert np.all(np.diff(cdf) >= 1)
        assert cdf[-1] == 65536
