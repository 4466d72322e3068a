"""DCVC-FM bitstream runtime: enc/dec bit-exact round-trips on the tiny
config (reference DCVC-family/DCVC-FM/src/models/video_model.py:396-500).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.legacy.dcvc_fm import TINY_FM_CONFIG
from dcvc_tpu.runtime.fm_codec import DMCFMCodec, cand_to_chw, chw_to_cand
from dcvc_tpu.core.masks import phase_terms_4x


@pytest.fixture(scope="module")
def fm_codec():
    return DMCFMCodec.init_random(jax.random.PRNGKey(0),
                                  cfg=TINY_FM_CONFIG, init_scale=0.4)


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 4.0)
    return [np.clip(np.roll(base, i * 2, 1)
                    + rng.normal(0, 0.01, (h, w, 3)), 0, 1)[None]
            .astype(np.float32) for i in range(n)]


def test_chw_reorder_inverse():
    rng = np.random.default_rng(0)
    terms = phase_terms_4x(8)
    for k in range(4):
        cand = rng.integers(-50, 50, (4, 6, 8)).astype(np.int16)
        flat = cand_to_chw(cand, terms[k])
        assert flat.shape == (2 * 8 * 12,)
        back = chw_to_cand(flat, terms[k], 4, 6)
        assert np.array_equal(back, cand)


def _roundtrip(codec, h, w, n_frames, q_index, fa_schedule=None):
    frames = _frames(h, w, n_frames, seed=q_index)
    fa_schedule = fa_schedule or [0] * n_frames

    codec.set_ref_frame(jnp.asarray(frames[0]), h, w)
    streams, recons = [], []
    for i in range(1, n_frames):
        res = codec.compress(jnp.asarray(frames[i]), q_index,
                             fa_idx=fa_schedule[i], h=h, w=w)
        streams.append(res["bit_stream"])
        recons.append(np.asarray(res["x_hat"]))
        assert len(res["bit_stream"]) > 8

    codec.set_ref_frame(jnp.asarray(frames[0]), h, w)
    for i, stream in enumerate(streams):
        out = codec.decompress(stream, q_index, h, w,
                               fa_idx=fa_schedule[i + 1])
        np.testing.assert_array_equal(np.asarray(out["x_hat"]), recons[i],
                                      err_msg=f"frame {i + 1} mismatch")
    return recons


def test_fm_two_frame_roundtrip(fm_codec):
    recons = _roundtrip(fm_codec, 64, 64, 3, q_index=3,
                        fa_schedule=[0, 0, 1])
    assert recons[0].shape == (1, 64, 64, 3)


def test_fm_nonaligned_resolution(fm_codec):
    # 48x80 -> y grid 3x5 (odd): exercises the pad-for-4 hyper path
    _roundtrip(fm_codec, 48, 80, 2, q_index=1)


def test_fm_qp_range(fm_codec):
    # wide-range q interpolation: extremes of the 64-QP range
    for q in (0, TINY_FM_CONFIG.qp_num - 1):
        _roundtrip(fm_codec, 64, 64, 2, q_index=q)
