"""Video codec round-trip tests: temporal state continuity across
chunks/frames, reset path, and the single-pass (HTS/LD) vs ladder (HTL)
entropy strategies must all reproduce the encoder reconstruction
bit-exactly from the bitstream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.models.dmc_ht import (
    DMCHT, TINY_HT_CONFIG, TINY_HTL_CONFIG,
)
from dcvc_tpu.models.dmc_ld import DMCLD, TINY_LD_CONFIG
from dcvc_tpu.runtime.video_codec import (
    DMCHTCodec, DMCLDCodec, _init_both_branches,
)


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 3.0)
    out = []
    for i in range(n):
        f = np.roll(base, i, axis=1) + rng.normal(0, 0.01, (h, w, 3))
        out.append(np.clip(f, 0, 1) - 0.5)
    return [f[None].astype(np.float32) for f in out]


@pytest.fixture(scope="module")
def hts_codec():
    return DMCHTCodec.init_random(jax.random.PRNGKey(0), cfg=TINY_HT_CONFIG,
                                  dtype=jnp.float32)


@pytest.fixture(scope="module")
def htl_codec():
    return DMCHTCodec.init_random(jax.random.PRNGKey(1), cfg=TINY_HTL_CONFIG,
                                  dtype=jnp.float32)


@pytest.fixture(scope="module")
def ld_codec():
    return DMCLDCodec.init_random(jax.random.PRNGKey(2), cfg=TINY_LD_CONFIG,
                                  dtype=jnp.float32)


def _roundtrip_chunks(codec, h, w, frames_per_unit, n_units, qp,
                      reset_at=None):
    frames = _frames(h, w, frames_per_unit * n_units, seed=qp)
    intra = frames[0]

    # ---- encode pass
    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    streams, enc_recons = [], []
    for u in range(n_units):
        chunk = np.concatenate(
            frames[u * frames_per_unit:(u + 1) * frames_per_unit], axis=-1)
        reset = (reset_at == u)
        res = codec.compress(chunk, qp, reset_feature_memory=reset,
                             recon=True)
        streams.append((res["bit_stream"], res["ec_parallel"], reset))
        enc_recons.append(np.asarray(res["x_hat"]))

    # ---- decode pass (fresh DPB, state rebuilt from the intra frame)
    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    for u, (stream, ec, reset) in enumerate(streams):
        out = codec.decompress(stream, qp, h, w, ec,
                               reset_feature_memory=reset)
        np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                      enc_recons[u],
                                      err_msg=f"unit {u} mismatch")
    return enc_recons


class TestHTS:
    def test_two_chunk_roundtrip(self, hts_codec):
        recons = _roundtrip_chunks(hts_codec, 64, 64, 8, 2, qp=3)
        assert recons[0].shape == (8, 64, 64 * 3)  # packed-RGB rows

    def test_reset_path(self, hts_codec):
        _roundtrip_chunks(hts_codec, 64, 64, 8, 3, qp=5, reset_at=1)

    def test_pipelined_sequence_identical(self, hts_codec):
        """compress_sequence/decompress_sequence (cross-chunk pipelined)
        must produce byte-identical streams and bit-identical frames to
        the serial per-chunk API."""
        codec = hts_codec
        h = w = 64
        frames = _frames(h, w, 8 * 3, seed=9)
        intra = frames[0]
        chunks = [np.concatenate(frames[u * 8:(u + 1) * 8], axis=-1)
                  for u in range(3)]
        qps = [3, 3, 5]

        codec.clear_dpb()
        codec.add_ref_feature_from_frame(intra)
        serial = [codec.compress(c, q) for c, q in zip(chunks, qps)]
        serial_dpb = np.asarray(codec.ref_feature)

        codec.clear_dpb()
        codec.add_ref_feature_from_frame(intra)
        piped = codec.compress_sequence(chunks, qps)
        np.testing.assert_array_equal(np.asarray(codec.ref_feature),
                                      serial_dpb)
        for u, (a, b) in enumerate(zip(serial, piped)):
            assert a["bit_stream"] == b["bit_stream"], f"chunk {u}"
            assert a["ec_parallel"] == b["ec_parallel"]

        codec.clear_dpb()
        codec.add_ref_feature_from_frame(intra)
        serial_out = [codec.decompress(r["bit_stream"], q, h, w,
                                       r["ec_parallel"])
                      for r, q in zip(serial, qps)]

        codec.clear_dpb()
        codec.add_ref_feature_from_frame(intra)
        piped_out = codec.decompress_sequence(
            [r["bit_stream"] for r in piped], qps, h, w,
            [r["ec_parallel"] for r in piped])
        np.testing.assert_array_equal(np.asarray(codec.ref_feature),
                                      serial_dpb)
        for u, (a, b) in enumerate(zip(serial_out, piped_out)):
            np.testing.assert_array_equal(np.asarray(a["x_hat"]),
                                          np.asarray(b), f"chunk {u}")


class TestHTL:
    def test_two_chunk_roundtrip(self, htl_codec):
        recons = _roundtrip_chunks(htl_codec, 64, 64, 8, 2, qp=2)
        assert recons[0].shape == (8, 64, 64 * 3)  # packed-RGB rows


class TestLD:
    def test_three_frame_roundtrip(self, ld_codec):
        recons = _roundtrip_chunks(ld_codec, 64, 64, 1, 3, qp=4)
        assert recons[0].shape == (1, 64, 64, 3)

    def test_nonaligned_resolution(self, ld_codec):
        _roundtrip_chunks(ld_codec, 48, 80, 1, 2, qp=1)


class TestTrainForward:
    def test_hts_train_forward(self):
        cfg = TINY_HT_CONFIG
        model = DMCHT(cfg=cfg, dtype=jnp.float32)
        x = jnp.asarray(np.concatenate(_frames(64, 64, 8), axis=-1))
        ref = jnp.zeros((1, 8, 8, 192), jnp.float32)
        params = _init_both_branches(
            model, x, ref, jnp.zeros((1, 8, 8, cfg.ch_d), jnp.float32),
            jnp.zeros((1, 8, 8, cfg.ch_m), jnp.float32), jax.random.PRNGKey(0))
        variables = {"params": params}
        result, feature, memory = model.apply(
            variables, x, ref, None, 3, jax.random.PRNGKey(2))
        assert len(result["x_hat"]) == 8
        assert len(result["mse"]) == 8
        assert np.isfinite(float(result["bpp"][0]))
        assert feature.shape == (1, 8, 8, TINY_HT_CONFIG.ch_d)
        assert memory.shape == (1, 8, 8, TINY_HT_CONFIG.ch_m)
        # second chunk: ref_feature is now the ch_d decoder feature and
        # memory routes through FeatureAdaptorM
        result2, _, _ = model.apply(
            variables, x, feature, memory, 3, jax.random.PRNGKey(3))
        assert np.isfinite(float(result2["bpp"][0]))

    def test_ld_train_forward(self):
        cfg = TINY_LD_CONFIG
        model = DMCLD(cfg=cfg, dtype=jnp.float32)
        x = jnp.asarray(_frames(64, 64, 1)[0])
        ref = jnp.zeros((1, 8, 8, 192), jnp.float32)
        params = _init_both_branches(
            model, x, ref, jnp.zeros((1, 8, 8, cfg.ch_d), jnp.float32),
            jnp.zeros((1, 8, 8, cfg.ch_m), jnp.float32), jax.random.PRNGKey(0))
        variables = {"params": params}
        result, feature, memory = model.apply(
            variables, x, ref, None, 2, jax.random.PRNGKey(2))
        assert result["x_hat"].shape == (1, 64, 64, 3)
        assert np.isfinite(float(result["bpp"][0]))
