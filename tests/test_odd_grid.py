"""Odd-latent-grid round trips.

The reference pads frames to multiples of 16 (test_video.py:187), so at
e.g. 720p/2160p the y grid is ODD (45 / 135 rows) and is coded directly:
masks are generated at arbitrary sizes (common_model.py:95-100) and only
the stride-2 hyper path pads y to 4-alignment (pad_for_y,
dmc_common.cpp:73-82) with its output cropped back before prior fusion.

These tests run every UF-generation codec (and DCVC-RT, which shares the
runtime) at 48x80 — y grid 3x5, both dimensions odd, z grid ceil(3/4)=1
— and assert the encoder/decoder agree bit-exactly, i.e. the candidate
domain's validity masking (core/masks.py phase_valid) keeps the two
sides' symbol sets identical.
"""

import numpy as np
import pytest
import jax.numpy as jnp

H, W = 48, 80   # -> y grid 3 x 5 (odd x odd), z grid 1 x 2


def test_dmci_odd_grid_roundtrip():
    from dcvc_tpu.runtime.image_codec import DMCICodec
    from dcvc_tpu.models.dmci import TINY_CONFIG
    codec = DMCICodec.init_random(cfg=TINY_CONFIG, dtype=jnp.float32,
                                  skip_thres=0.0)
    rng = np.random.default_rng(0)
    for (h, w) in [(H, W), (W, H), (50, 70)]:
        x = jnp.asarray(rng.uniform(-0.5, 0.5, (1, h, w, 3))
                        .astype(np.float32))
        r = codec.compress(x, 3, h, w)
        out = codec.decompress(r["bit_stream"], 3, h, w, r["ec_parallel"])
        assert np.array_equal(np.asarray(r["x_hat"]),
                              np.asarray(out["x_hat"]))
        assert out["x_hat"].shape == (1, h, w, 3)


def _video_roundtrip(codec, fd, h=H, w=W, qp=2):
    rng = np.random.default_rng(1)
    intra = jnp.asarray(rng.uniform(-0.5, 0.5, (1, h, w, 3))
                        .astype(np.float32))
    chunks = [jnp.asarray(rng.uniform(-0.5, 0.5, (1, h, w, 3 * fd))
                          .astype(np.float32)) for _ in range(2)]
    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    rs = [codec.compress(c, qp, recon=True) for c in chunks]
    enc_ref = np.asarray(codec.ref_feature)
    enc_xh = [np.asarray(r["x_hat"]) for r in rs]

    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    outs = codec.decompress_sequence([r["bit_stream"] for r in rs],
                                     [qp] * 2, h, w,
                                     [r["ec_parallel"] for r in rs])
    assert np.array_equal(enc_ref, np.asarray(codec.ref_feature))
    for e, o in zip(enc_xh, outs):
        assert np.array_equal(e, np.asarray(o))


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["hts", "htl"])
def test_ht_odd_grid_roundtrip(variant):
    from dcvc_tpu.models.dmc_ht import TINY_HT_CONFIG, TINY_HTL_CONFIG
    from dcvc_tpu.runtime.video_codec import DMCHTCodec
    cfg = TINY_HT_CONFIG if variant == "hts" else TINY_HTL_CONFIG
    codec = DMCHTCodec.init_random(cfg=cfg, dtype=jnp.float32,
                                   skip_thres=0.0)
    _video_roundtrip(codec, fd=8)


@pytest.mark.slow
def test_ld_odd_grid_roundtrip():
    from dcvc_tpu.models.dmc_ld import TINY_LD_CONFIG
    from dcvc_tpu.runtime.video_codec import DMCLDCodec
    codec = DMCLDCodec.init_random(cfg=TINY_LD_CONFIG, dtype=jnp.float32,
                                   skip_thres=0.0)
    _video_roundtrip(codec, fd=1)


def test_phase_valid_counts():
    """Across the 4 quadtree steps every position is covered exactly
    once, so each step codes exactly h*w*c/4 real candidates."""
    from dcvc_tpu.core.masks import (phase_terms_4x, phase_valid,
                                     terms_key)
    c = 8
    for (h, w) in [(3, 5), (4, 5), (3, 6), (4, 6)]:
        terms = phase_terms_4x(c)
        tot = sum(int(phase_valid(h, w, terms_key(t)).sum())
                  for t in terms)
        assert tot == h * w * c
