"""End-to-end DMCI tests: training forward sanity + bitstream round-trip.

The round-trip is the core correctness gate (reference strategy: bitstream
writing + decode-back, test_video.py:274-318): encoder and decoder must
derive bit-identical priors or reconstruction collapses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.runtime import DMCICodec
from dcvc_tpu.models.dmci import DMCI, TINY_CONFIG


@pytest.fixture(scope="module")
def codec():
    return DMCICodec.init_random(jax.random.PRNGKey(0), cfg=TINY_CONFIG,
                                 dtype=jnp.float32)


def _rand_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish image in [-0.5, 0.5]
    x = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    for c in range(3):
        x[0, :, :, c] = gaussian_filter(x[0, :, :, c], 3.0)
    return np.clip(x, 0, 1) - 0.5


class TestTrainForward:
    def test_forward_shapes_and_finite(self, codec):
        model = DMCI(cfg=TINY_CONFIG, dtype=jnp.float32)
        x = jnp.asarray(_rand_image(64, 64))
        out = model.apply({"params": codec.params}, x, 5, jax.random.PRNGKey(2))
        assert out["x_hat"].shape == x.shape
        assert out["bpp"].shape == (1,)
        assert np.isfinite(float(out["bpp"][0]))
        assert np.isfinite(float(out["mse"][0]))
        assert float(out["bits_y"][0]) >= 0
        assert float(out["bits_z"][0]) >= 0

    def test_grads_flow(self, codec):
        model = DMCI(cfg=TINY_CONFIG, dtype=jnp.float32)
        x = jnp.asarray(_rand_image(64, 64, seed=1))

        def loss_fn(params):
            out = model.apply({"params": params}, x, 3, jax.random.PRNGKey(0))
            return jnp.mean(100.0 * out["mse"] + out["bpp"])

        grads = jax.grad(loss_fn)(codec.params)
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        # at least the encoder and the z prior receive gradient
        g_enc = np.asarray(grads["enc"]["enc_1"]["dc_in"]["conv"]["kernel"])
        assert np.abs(g_enc).max() > 0
        g_z = np.asarray(grads["bit_estimator_z"]["h"])
        assert np.abs(g_z).max() > 0


class TestRoundTrip:
    @pytest.mark.parametrize("h,w,qp", [(64, 64, 0), (48, 80, 3), (64, 64, 7)])
    def test_bitstream_roundtrip(self, codec, h, w, qp):
        x = _rand_image(h, w, seed=qp)
        result = codec.compress(x, qp)
        assert len(result["bit_stream"]) > 0

        out = codec.decompress(result["bit_stream"], qp, h, w,
                               result["ec_parallel"])
        x_hat_enc = np.asarray(result["x_hat"])
        x_hat_dec = np.asarray(out["x_hat"])
        assert x_hat_dec.shape == (1, h, w, 3)
        # encoder and decoder reconstructions must agree bit-exactly
        np.testing.assert_array_equal(x_hat_enc, x_hat_dec)

    def test_skip_thres_roundtrip(self):
        codec = DMCICodec.init_random(jax.random.PRNGKey(1), cfg=TINY_CONFIG,
                                      dtype=jnp.float32, skip_thres=0.15)
        x = _rand_image(64, 64, seed=7)
        result = codec.compress(x, 5)
        out = codec.decompress(result["bit_stream"], 5, 64, 64,
                               result["ec_parallel"])
        np.testing.assert_array_equal(np.asarray(result["x_hat"]),
                                      np.asarray(out["x_hat"]))


class TestPipelined:
    def test_many_identical_to_serial(self, codec):
        """compress_many/decompress_many (cross-image pipelined) must be
        byte-identical to the serial per-image API."""
        h = w = 64
        images = [_rand_image(h, w, seed=s) for s in range(5)]
        qps = [0, 3, 3, 7, 5]

        serial = [codec.compress(x, q) for x, q in zip(images, qps)]
        piped = codec.compress_many(images, qps)
        for u, (a, b) in enumerate(zip(serial, piped)):
            assert a["bit_stream"] == b["bit_stream"], f"image {u}"
            assert a["ec_parallel"] == b["ec_parallel"]
            np.testing.assert_array_equal(np.asarray(a["x_hat"]),
                                          np.asarray(b["x_hat"]))

        serial_out = [codec.decompress(r["bit_stream"], q, h, w,
                                       r["ec_parallel"])
                      for r, q in zip(serial, qps)]
        piped_out = codec.decompress_many(
            [r["bit_stream"] for r in piped], qps, h, w,
            [r["ec_parallel"] for r in piped], depth=3)
        for u, (a, b) in enumerate(zip(serial_out, piped_out)):
            np.testing.assert_array_equal(np.asarray(a["x_hat"]),
                                          np.asarray(b["x_hat"]), f"image {u}")
