"""EVC image-codec bitstream runtime round-trips (tiny config),
reference DCVC-family/EVC/src/models/image_model.py:131-200."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.legacy.evc import TINY_EVC_CONFIG
from dcvc_tpu.runtime.evc_codec import EVCCodec


@pytest.fixture(scope="module")
def evc_codec():
    return EVCCodec.init_random(jax.random.PRNGKey(0),
                                cfg=TINY_EVC_CONFIG)


def _image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)


def test_evc_roundtrip(evc_codec):
    h = w = 64
    x = _image(h, w, seed=7)
    for qs in (0.8, 1.4):
        res = evc_codec.compress(jnp.asarray(x), qs, h=h, w=w)
        assert len(res["bit_stream"]) > 8
        out = evc_codec.decompress(res["bit_stream"], qs, h, w)
        np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                      np.asarray(res["x_hat"]))


def test_intra_noar_roundtrip():
    """IntraNoAR (HEM/DC/FM intra) under the same runtime."""
    from dcvc_tpu.legacy.hem_intra import TINY_INTRA_NOAR_CONFIG
    from dcvc_tpu.runtime.evc_codec import IntraNoARCodec

    codec = IntraNoARCodec.init_random(jax.random.PRNGKey(1),
                                       cfg=TINY_INTRA_NOAR_CONFIG)
    h = w = 64
    x = _image(h, w, seed=9)
    res = codec.compress(jnp.asarray(x), 1.1, h=h, w=w)
    assert len(res["bit_stream"]) > 8
    out = codec.decompress(res["bit_stream"], 1.1, h, w)
    np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                  np.asarray(res["x_hat"]))


def test_intra_noar_train_forward():
    from dcvc_tpu.legacy.hem_intra import IntraNoAR, TINY_INTRA_NOAR_CONFIG

    model = IntraNoAR(cfg=TINY_INTRA_NOAR_CONFIG, dtype=jnp.float32)
    x = jnp.asarray(_image(64, 64, seed=2))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(params, x, rng=jax.random.PRNGKey(1))
    assert out["x_hat"].shape == (1, 64, 64, 3)
    assert np.isfinite(float(out["bpp"][0]))


def test_evc_scalable_roundtrip():
    """Scalable-encoder variant: progressive encoder average
    (scalable_encoder_model.py:27-100) under the same runtime."""
    from dcvc_tpu.legacy.evc import TINY_SCALABLE_EVC_CONFIG

    codec = EVCCodec.init_random(jax.random.PRNGKey(2),
                                 cfg=TINY_SCALABLE_EVC_CONFIG)
    h = w = 64
    x = _image(h, w, seed=11)
    res = codec.compress(jnp.asarray(x), 1.0, h=h, w=w)
    assert len(res["bit_stream"]) > 8
    out = codec.decompress(res["bit_stream"], 1.0, h, w)
    np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                  np.asarray(res["x_hat"]))


def test_evc_asymmetric_plan_forward():
    """L/M/S enc-dec channel-plan pairs (image_model.py:203-258)."""
    from dcvc_tpu.legacy.evc import EVC, EVCConfig

    cfg = EVCConfig(channels=(8, 8, 12, 16), dec_channels=(4, 4, 8, 16),
                    n=16)
    model = EVC(cfg=cfg, dtype=jnp.float32)
    x = jnp.asarray(_image(64, 64, seed=3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(params, x)
    assert out["x_hat"].shape == (1, 64, 64, 3)
    assert np.isfinite(float(out["bpp"][0]))
