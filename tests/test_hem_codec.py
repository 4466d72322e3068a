"""DCVC-HEM bitstream runtime: enc/dec bit-exact round-trips (tiny
config), reference DCVC-family/DCVC-HEM/src/models/video_model.py:259-372.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.legacy.dcvc_hem import TINY_HEM_CONFIG
from dcvc_tpu.runtime.hem_codec import DMCHEMCodec


@pytest.fixture(scope="module")
def hem_codec():
    return DMCHEMCodec.init_random(jax.random.PRNGKey(0),
                                   cfg=TINY_HEM_CONFIG, init_scale=0.4)


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 4.0)
    return [np.clip(np.roll(base, i * 2, 1)
                    + rng.normal(0, 0.01, (h, w, 3)), 0, 1)[None]
            .astype(np.float32) for i in range(n)]


def _roundtrip(codec, h, w, n_frames, q_mv, q_y):
    frames = _frames(h, w, n_frames, seed=1)
    codec.set_ref_frame(jnp.asarray(frames[0]), h, w)
    streams, recons = [], []
    for i in range(1, n_frames):
        res = codec.compress(jnp.asarray(frames[i]), q_mv, q_y, h=h, w=w)
        streams.append(res["bit_stream"])
        recons.append(np.asarray(res["x_hat"]))
        assert len(res["bit_stream"]) > 8

    codec.set_ref_frame(jnp.asarray(frames[0]), h, w)
    for i, stream in enumerate(streams):
        out = codec.decompress(stream, q_mv, q_y, h, w)
        np.testing.assert_array_equal(np.asarray(out["x_hat"]), recons[i],
                                      err_msg=f"frame {i + 1} mismatch")
    return recons


def test_hem_two_frame_roundtrip(hem_codec):
    recons = _roundtrip(hem_codec, 64, 64, 3, q_mv=1.0, q_y=1.0)
    assert recons[0].shape == (1, 64, 64, 3)


def test_hem_rate_scales(hem_codec):
    # continuous single-model rate adjustment: q scales are traced, so
    # distinct values reuse the same programs
    _roundtrip(hem_codec, 64, 64, 2, q_mv=0.7, q_y=1.31)
