"""DCVC-DC bitstream runtime round-trips (tiny config), reference
DCVC-family/DCVC-DC/src/models/video_model.py:425-520."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.legacy.dcvc_dc import TINY_DC_CONFIG, INDEX_MAP
from dcvc_tpu.runtime.dc_codec import DMCDCCodec


@pytest.fixture(scope="module")
def dc_codec():
    return DMCDCCodec.init_random(jax.random.PRNGKey(0),
                                  cfg=TINY_DC_CONFIG, init_scale=0.4)


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 4.0)
    return [np.clip(np.roll(base, i * 2, 1)
                    + rng.normal(0, 0.01, (h, w, 3)), 0, 1)[None]
            .astype(np.float32) for i in range(n)]


def test_dc_roundtrip_with_adaptor_schedule(dc_codec):
    h = w = 64
    frames = _frames(h, w, 4, seed=2)
    codec = dc_codec
    q = 31

    codec.set_ref_frame(jnp.asarray(frames[0]), h, w)
    streams, recons = [], []
    for i in range(1, 4):
        fa = INDEX_MAP[i % 4]
        res = codec.compress(jnp.asarray(frames[i]), q, fa_idx=fa, h=h, w=w)
        streams.append((res["bit_stream"], fa))
        recons.append(np.asarray(res["x_hat"]))

    codec.set_ref_frame(jnp.asarray(frames[0]), h, w)
    for i, (stream, fa) in enumerate(streams):
        out = codec.decompress(stream, q, h, w, fa_idx=fa)
        np.testing.assert_array_equal(np.asarray(out["x_hat"]), recons[i],
                                      err_msg=f"frame {i + 1} mismatch")
