"""Vendored CompressAI I-frame codecs (cheng2020-anchor /
bmshj2018-hyperprior): entropy-bank math + bitstream round-trips.

Reference semantics: DCVC-family/DCVC/src/entropy_models/
entropy_models.py (EntropyBottleneck :209-390, GaussianConditional
:395-520) and src/models/{priors,waseda}.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.entropy.compressai import (build_indexes,
                                         compressai_scale_table,
                                         eb_bank, eb_init_params,
                                         eb_likelihood)
from dcvc_tpu.legacy.compressai_zoo import (Cheng2020Anchor,
                                            Cheng2020Config,
                                            HyperpriorConfig,
                                            ScaleHyperprior,
                                            TINY_CHENG2020,
                                            TINY_HYPERPRIOR)
from dcvc_tpu.runtime.compressai_codec import (Cheng2020Codec,
                                               HyperpriorCodec)


def _image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    for c in range(3):
        x[0, :, :, c] = gaussian_filter(x[0, :, :, c], 3.0)
    return np.clip(x, 0, 1)


class TestBanks:
    def test_scale_table(self):
        t = compressai_scale_table()
        assert t.shape == (64,)
        assert abs(t[0] - 0.11) < 1e-9 and abs(t[-1] - 256.0) < 1e-6

    def test_build_indexes_monotone(self):
        scales = np.array([0.0, 0.11, 0.2, 1.0, 255.0, 300.0])
        idx = build_indexes(scales)
        assert idx[0] == 0 and idx[1] == 0
        assert np.all(np.diff(idx) >= 0) and idx[-1] == 63

    def test_eb_bank_shapes_and_likelihood(self):
        p = eb_init_params(8)
        cdf, lengths, offsets, medians = eb_bank(p)
        assert cdf.shape[0] == 8 and lengths.shape == (8,)
        # pmf from the same logits integrates to ~1 inside the support
        x = jnp.zeros((1, 4, 4, 8))
        like = eb_likelihood(p, x)
        assert like.shape == (1, 4, 4, 8)
        assert np.all(np.asarray(like) > 0) and np.all(np.asarray(like) <= 1)


class TestHyperprior:
    @pytest.fixture(scope="class")
    def codec(self):
        return HyperpriorCodec.init_random(jax.random.PRNGKey(0),
                                           cfg=TINY_HYPERPRIOR)

    def test_forward(self, codec):
        model = ScaleHyperprior(cfg=TINY_HYPERPRIOR)
        x = jnp.asarray(_image(64, 64))
        out = model.apply({"params": codec.params}, x,
                          rng=jax.random.PRNGKey(1))
        assert out["x_hat"].shape == x.shape
        assert out["scales_hat"].shape == out["y"].shape

    def test_roundtrip(self, codec):
        x = _image(64, 64, seed=1)
        res = codec.compress(x)
        assert len(res["y_string"]) > 0 and len(res["z_string"]) > 0
        out = codec.decompress(res["y_string"], res["z_string"], 64, 64)
        np.testing.assert_array_equal(np.asarray(res["x_hat"]),
                                      np.asarray(out["x_hat"]))

    def test_roundtrip_nonaligned(self, codec):
        x = _image(48, 80, seed=2)
        res = codec.compress(x)
        out = codec.decompress(res["y_string"], res["z_string"], 48, 80)
        assert np.asarray(out["x_hat"]).shape == (1, 48, 80, 3)
        np.testing.assert_array_equal(np.asarray(res["x_hat"]),
                                      np.asarray(out["x_hat"]))


class TestCheng2020:
    @pytest.fixture(scope="class")
    def codec(self):
        return Cheng2020Codec.init_random(jax.random.PRNGKey(0),
                                          cfg=TINY_CHENG2020)

    def test_forward(self, codec):
        model = Cheng2020Anchor(cfg=TINY_CHENG2020)
        x = jnp.asarray(_image(64, 64))
        out = model.apply({"params": codec.params}, x,
                          rng=jax.random.PRNGKey(1))
        assert out["x_hat"].shape == x.shape
        assert out["means_hat"].shape == out["y"].shape

    def test_roundtrip(self, codec):
        x = _image(64, 64, seed=3)
        res = codec.compress(x)
        out = codec.decompress(res["y_string"], res["z_string"], 64, 64)
        np.testing.assert_array_equal(np.asarray(res["x_hat"]),
                                      np.asarray(out["x_hat"]))
