"""Device-entropy-decode path of the video codecs: with device_ec=True
the whole decode ladder (z decode, per-rung rANS, merge, final) runs as
device programs with no blocking host round-trips — and must reproduce
the host-coder decode bit-exactly, for both the single-pass (HTS) and
ladder (HTL) strategies, across chunks (threaded lane states)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.models.dmc_ht import DMCHT, TINY_HT_CONFIG, TINY_HTL_CONFIG
from dcvc_tpu.models.dmc_ld import TINY_LD_CONFIG
from dcvc_tpu.runtime.video_codec import DMCHTCodec, DMCLDCodec


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 3.0)
    out = []
    for i in range(n):
        f = np.roll(base, i, axis=1) + rng.normal(0, 0.01, (h, w, 3))
        out.append(np.clip(f, 0, 1) - 0.5)
    return [f[None].astype(np.float32) for f in out]


@pytest.mark.parametrize("cfg,seed", [(TINY_HT_CONFIG, 0),
                                      (TINY_HTL_CONFIG, 1)])
def test_device_ec_matches_host_decode(cfg, seed):
    codec = DMCHTCodec.init_random(jax.random.PRNGKey(seed), cfg=cfg,
                                   dtype=jnp.float32)
    h = w = 64
    f = cfg.frame_delay
    frames = _frames(h, w, 2 * f, seed=seed)
    intra = frames[0]

    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    streams, enc_recons = [], []
    for u in range(2):
        chunk = np.concatenate(frames[u * f:(u + 1) * f], axis=-1)
        res = codec.compress(chunk, 3, recon=True)
        streams.append((res["bit_stream"], res["ec_parallel"]))
        enc_recons.append(np.asarray(res["x_hat"]))

    # host-coder decode (oracle)
    codec.device_ec = False
    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    host = [np.asarray(codec.decompress(s, 3, h, w, ec)["x_hat"])
            for s, ec in streams]

    # device-entropy decode
    codec.device_ec = True
    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    dev = [np.asarray(codec.decompress(s, 3, h, w, ec)["x_hat"])
           for s, ec in streams]

    for u in range(2):
        np.testing.assert_array_equal(host[u], enc_recons[u])
        np.testing.assert_array_equal(dev[u], enc_recons[u])


def test_device_ec_ld_codec():
    """LD (2-step checkerboard, frame_delay 1) through the device-EC
    path: single-pass branch with a different mask geometry."""
    codec = DMCLDCodec.init_random(jax.random.PRNGKey(4),
                                   cfg=TINY_LD_CONFIG, dtype=jnp.float32)
    codec.device_ec = True
    h = w = 64
    frames = _frames(h, w, 3, seed=4)
    codec.clear_dpb()
    codec.add_ref_feature_from_frame(frames[0])
    streams, enc_recons = [], []
    for u in range(2):
        res = codec.compress(frames[u + 1], 2, recon=True)
        streams.append((res["bit_stream"], res["ec_parallel"]))
        enc_recons.append(np.asarray(res["x_hat"]))
    codec.clear_dpb()
    codec.add_ref_feature_from_frame(frames[0])
    for u, (s, ec) in enumerate(streams):
        out = codec.decompress(s, 2, h, w, ec)
        np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                      enc_recons[u])


def test_device_ec_image_codec_matches_host():
    from dcvc_tpu.models.dmci import TINY_CONFIG
    from dcvc_tpu.runtime import DMCICodec
    codec = DMCICodec.init_random(jax.random.PRNGKey(0), cfg=TINY_CONFIG,
                                  dtype=jnp.float32, skip_thres=0.15)
    h, w = 96, 80
    x = np.random.default_rng(0).uniform(
        -0.5, 0.5, (1, h, w, 3)).astype(np.float32)
    res = codec.compress(x, 2)
    enc = np.asarray(res["x_hat"])

    codec.device_ec = False
    host = np.asarray(codec.decompress(res["bit_stream"], 2, h, w,
                                       res["ec_parallel"])["x_hat"])
    codec.device_ec = True
    dev = np.asarray(codec.decompress(res["bit_stream"], 2, h, w,
                                      res["ec_parallel"])["x_hat"])
    np.testing.assert_array_equal(host, enc)
    np.testing.assert_array_equal(dev, enc)

    # decompress_many keeps working (and identical) with device EC
    outs = codec.decompress_many([res["bit_stream"]] * 3, [2] * 3, h, w,
                                 [res["ec_parallel"]] * 3, depth=2)
    for o in outs:
        np.testing.assert_array_equal(np.asarray(o["x_hat"]), enc)


def test_device_ec_pipelined_sequence_identical():
    codec = DMCHTCodec.init_random(jax.random.PRNGKey(2),
                                   cfg=TINY_HT_CONFIG, dtype=jnp.float32)
    codec.device_ec = True
    h = w = 64
    f = TINY_HT_CONFIG.frame_delay
    frames = _frames(h, w, 3 * f, seed=3)
    intra = frames[0]
    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    streams, enc_recons = [], []
    for u in range(3):
        chunk = np.concatenate(frames[u * f:(u + 1) * f], axis=-1)
        res = codec.compress(chunk, 5, recon=True)
        streams.append((res["bit_stream"], res["ec_parallel"]))
        enc_recons.append(np.asarray(res["x_hat"]))

    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    outs = codec.decompress_sequence([s for s, _ in streams], [5] * 3,
                                     h, w, [ec for _, ec in streams])
    for u in range(3):
        np.testing.assert_array_equal(np.asarray(outs[u]), enc_recons[u])
