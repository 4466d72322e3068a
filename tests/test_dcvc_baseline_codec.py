"""DCVC (2021 baseline) bitstream runtime with host-side serial AR
decode (documented slow path), reference DCVC/src/models/DCVC_net.py:257-414."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.legacy.dcvc_net import TINY_DCVC_CONFIG
from dcvc_tpu.runtime.dcvc_codec import DCVCCodec


@pytest.fixture(scope="module")
def dcvc_codec():
    return DCVCCodec.init_random(jax.random.PRNGKey(0),
                                 cfg=TINY_DCVC_CONFIG)


def test_dcvc_ar_roundtrip(dcvc_codec):
    h = w = 64
    rng = np.random.default_rng(3)
    ref = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    cur = np.clip(ref + rng.normal(0, 0.05, ref.shape), 0, 1) \
        .astype(np.float32)
    codec = dcvc_codec

    codec.set_ref_frame(jnp.asarray(ref), h, w)
    res = codec.compress(jnp.asarray(cur), h=h, w=w)
    assert len(res["y_string"]) > 4 and len(res["mv_y_string"]) > 4

    codec.set_ref_frame(jnp.asarray(ref), h, w)
    out = codec.decompress(res["mv_y_string"], res["mv_z_string"],
                           res["y_string"], res["z_string"], h, w)
    np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                  np.asarray(res["x_hat"]))
