"""DCVC-RT tests: bitstream round-trip under the shared runtime +
module-bank qp shift."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.legacy.dcvc_rt import (
    DMCRTCodec, TINY_RT_CONFIG, shift_qp, EXTRA_QP,
)


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 3.0)
    return [np.clip(np.roll(base, i, 1)
                    + rng.normal(0, 0.01, (h, w, 3)), 0, 1)[None]
            .astype(np.float32) for i in range(n)]


def test_rt_bitstream_roundtrip():
    codec = DMCRTCodec.init_random(jax.random.PRNGKey(0),
                                   cfg=TINY_RT_CONFIG, dtype=jnp.float32)
    assert codec.steps == 2 and not codec.single_pass
    frames = _frames(64, 64, 3)
    intra = frames[0]

    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    streams, recons = [], []
    for i in (1, 2):
        res = codec.compress(frames[i], qp=3, recon=True)
        streams.append((res["bit_stream"], res["ec_parallel"]))
        recons.append(np.asarray(res["x_hat"]))

    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    for (stream, ec), want in zip(streams, recons):
        out = codec.decompress(stream, 3, 64, 64, ec)
        np.testing.assert_array_equal(np.asarray(out["x_hat"]), want)


def test_qp_shift_schedule():
    assert shift_qp(10, 0) == 10
    assert shift_qp(10, 1) == 18
    assert shift_qp(10, 2) == 14
    assert shift_qp(63, 1) == 63 + EXTRA_QP  # clamped to the bank edge
