"""DCVC-TCM bitstream runtime round-trips (tiny config), reference
DCVC-family/DCVC-TCM/src/models/video_net_dmc.py:315-380."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.legacy.dcvc_tcm import TINY_TCM_CONFIG
from dcvc_tpu.runtime.tcm_codec import DMCTCMCodec


@pytest.fixture(scope="module")
def tcm_codec():
    return DMCTCMCodec.init_random(jax.random.PRNGKey(0),
                                   cfg=TINY_TCM_CONFIG, init_scale=0.4)


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 4.0)
    return [np.clip(np.roll(base, i * 2, 1)
                    + rng.normal(0, 0.01, (h, w, 3)), 0, 1)[None]
            .astype(np.float32) for i in range(n)]


def test_tcm_roundtrip(tcm_codec):
    h = w = 64
    frames = _frames(h, w, 3, seed=5)
    codec = tcm_codec

    codec.set_ref_frame(jnp.asarray(frames[0]), h, w)
    streams, recons = [], []
    for i in (1, 2):
        res = codec.compress(jnp.asarray(frames[i]), h=h, w=w)
        streams.append(res["bit_stream"])
        recons.append(np.asarray(res["x_hat"]))
        assert len(res["bit_stream"]) > 8

    codec.set_ref_frame(jnp.asarray(frames[0]), h, w)
    for i, stream in enumerate(streams):
        out = codec.decompress(stream, h, w)
        np.testing.assert_array_equal(np.asarray(out["x_hat"]), recons[i],
                                      err_msg=f"frame {i + 1} mismatch")
