"""DCVC-RT intra codec: bitstream round-trip through the RT runtime
(hyper-predicted q_enc/q_dec maps, 2-lane ec cap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.legacy.rt_intra import DMCIRT, TINY_RT_INTRA_CONFIG
from dcvc_tpu.runtime.rt_image_codec import RTIntraCodec


@pytest.fixture(scope="module")
def codec():
    return RTIntraCodec.init_random(jax.random.PRNGKey(3),
                                    cfg=TINY_RT_INTRA_CONFIG,
                                    dtype=jnp.float32, skip_thres=0.0)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    x = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 2.0)
    return np.clip(x, 0, 1)[None].astype(np.float32)


@pytest.mark.parametrize("qp", [0, 5])
def test_rt_intra_roundtrip(codec, qp):
    x = _img(64, 64, seed=qp)
    res = codec.compress(x, qp)
    assert res["ec_parallel"] <= 2
    out = codec.decompress(res["bit_stream"], qp, 64, 64,
                           res["ec_parallel"])
    np.testing.assert_array_equal(np.asarray(res["x_hat"]),
                                  np.asarray(out["x_hat"]))
    assert np.asarray(out["x_hat"]).min() >= 0.0  # RT [0,1] domain
    assert np.asarray(out["x_hat"]).max() <= 1.0


def test_rt_intra_odd_resolution(codec):
    x = _img(70, 90, seed=9)
    res = codec.compress(x, 2, h=70, w=90)
    out = codec.decompress(res["bit_stream"], 2, 70, 90,
                           res["ec_parallel"])
    assert np.asarray(out["x_hat"]).shape == (1, 70, 90, 3)
    np.testing.assert_array_equal(np.asarray(res["x_hat"]),
                                  np.asarray(out["x_hat"]))


def test_rt_intra_training_forward(codec):
    model = DMCIRT(cfg=TINY_RT_INTRA_CONFIG, dtype=jnp.float32)
    x = jnp.asarray(_img(64, 64, seed=1))
    out = jax.jit(lambda p, x, r: model.apply(
        {"params": p}, x, jnp.zeros((1,), jnp.int32), r))(
        codec.params, x, jax.random.PRNGKey(0))
    assert np.isfinite(float(out["bpp"][0]))
    assert np.isfinite(float(out["mse"][0]))
