"""On-device rANS decoder conformance vs the host (C++) coder.

The host encoder (rans.cc, byte-conformant with the reference py_rans —
tests/test_uf_rans_conformance.py) produces the stream; the XLA decoder
(dcvc_tpu/rans/device_decode.py) must reproduce the exact symbols for
every lane-merge layout, including bypass escapes and a z-then-y
interleave threading one state through multiple decode calls (the
decode-ladder pattern of the video codecs)."""

import numpy as np
import pytest
import jax

from dcvc_tpu.rans import RansEncoder, RansDecoder
from dcvc_tpu.rans.device_decode import (
    split_streams, init_state, make_decode_fn, make_decode_z_fn)


def _random_bank(rng, n_cdf, alphabet):
    """Quantized CDF rows like the codec banks (last entry 65536)."""
    from dcvc_tpu.entropy.cdf import pmf_to_quantized_cdf
    per = alphabet + 2
    cdf = np.zeros((n_cdf, per), np.int32)
    lengths = np.full((n_cdf,), per, np.int32)
    for i in range(n_cdf):
        pmf = rng.dirichlet(np.full(alphabet + 1, 0.6))
        cdf[i, :alphabet + 2] = pmf_to_quantized_cdf(pmf)
    return cdf, lengths


def _fold(s):
    """Signed symbol -> zig-zag value (enc_symbol, rans.cc:97)."""
    return abs(s) * 2 - (1 if s > 0 else 0)


def _encode_y(cdf, lengths, symbols, idx, n_lanes):
    enc = RansEncoder()
    enc.set_cdf(cdf, lengths, 1)
    enc.set_parallel(n_lanes)
    enc.reset()
    combined = ((symbols.astype(np.int16) << 8)
                | idx.astype(np.int16)).astype(np.int16)
    enc.encode_y(combined)
    enc.flush()
    return enc.get_encoded_stream()


@pytest.mark.parametrize("n_lanes", [1, 2, 3, 5, 8])
def test_device_decode_y_matches_host(n_lanes):
    rng = np.random.default_rng(n_lanes)
    cdf, lengths = _random_bank(rng, 7, 12)
    n = 1000 + n_lanes
    idx = rng.integers(0, 7, n).astype(np.uint8)
    # symbols within alphabet plus escapes into bypass (|s| large)
    symbols = rng.integers(-5, 6, n).astype(np.int8)
    esc = rng.random(n) < 0.02
    symbols[esc] = rng.integers(30, 120, esc.sum())
    stream = _encode_y(cdf, lengths, symbols, idx, n_lanes)

    # host decode (oracle)
    dec = RansDecoder()
    dec.set_cdf(cdf, lengths, 1)
    dec.set_parallel(n_lanes)
    dec.set_stream(stream)
    dec.decode_y(idx)
    want = dec.get_decoded(n)

    lanes, _ = split_streams(stream, n_lanes)
    cap = n + 16
    decode = jax.jit(make_decode_fn(cdf, lengths, n_lanes, cap))
    idx_pad = np.zeros(cap, np.uint8)
    idx_pad[:n] = idx
    _, got = decode(init_state(lanes), idx_pad, n)
    got = np.asarray(got)[:n]
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, symbols.astype(np.int8))


def test_device_decode_z_then_y_threads_state():
    """One decoder state across decode_z + two decode_y rungs — the
    video-ladder pattern (video_codec._decompress_core)."""
    rng = np.random.default_rng(7)
    n_lanes = 8
    z_cdf, z_len = _random_bank(rng, 12, 16)
    y_cdf, y_len = _random_bank(rng, 9, 10)
    ch = 4
    nz = 256
    z = rng.integers(-7, 8, nz).astype(np.int8)
    ny1, ny2 = 700, 500
    i1 = rng.integers(0, 9, ny1).astype(np.uint8)
    i2 = rng.integers(0, 9, ny2).astype(np.uint8)
    s1 = rng.integers(-4, 5, ny1).astype(np.int8)
    s2 = rng.integers(-4, 5, ny2).astype(np.int8)

    # encode in LIFO order (the video codec encodes step k = last..0,
    # then z, video_codec.py compress_finish): decode order is z, y1, y2
    enc = RansEncoder()
    enc.set_cdf(z_cdf, z_len, 0)
    enc.set_cdf(y_cdf, y_len, 1)
    enc.set_parallel(n_lanes)
    enc.reset()
    enc.encode_y(((s2.astype(np.int16) << 8) | i2).astype(np.int16))
    enc.encode_y(((s1.astype(np.int16) << 8) | i1).astype(np.int16))
    enc.encode_z(z, 2 * ch, ch)
    enc.flush()
    stream = enc.get_encoded_stream()

    # host oracle decodes z, y1, y2
    dec = RansDecoder()
    dec.set_cdf(z_cdf, z_len, 0)
    dec.set_cdf(y_cdf, y_len, 1)
    dec.set_parallel(n_lanes)
    dec.set_stream(stream)
    dec.decode_z(nz, 2 * ch, ch)
    wz = dec.get_decoded(nz)
    dec.decode_y(i1)
    w1 = dec.get_decoded(ny1)
    dec.decode_y(i2)
    w2 = dec.get_decoded(ny2)
    # the oracle itself must recover the original symbols
    np.testing.assert_array_equal(wz, z)
    np.testing.assert_array_equal(w1, s1)
    np.testing.assert_array_equal(w2, s2)

    lanes, _ = split_streams(stream, n_lanes)
    state = init_state(lanes)
    dz = jax.jit(make_decode_z_fn(z_cdf, z_len, n_lanes, nz, 2 * ch, ch))
    dy1 = jax.jit(make_decode_fn(y_cdf, y_len, n_lanes, ny1))
    dy2 = jax.jit(make_decode_fn(y_cdf, y_len, n_lanes, ny2))
    state, gz = dz(state)
    state, g1 = dy1(state, i1, ny1)
    state, g2 = dy2(state, i2, ny2)
    np.testing.assert_array_equal(np.asarray(gz), wz)
    np.testing.assert_array_equal(np.asarray(g1)[:ny1], w1)
    np.testing.assert_array_equal(np.asarray(g2)[:ny2], w2)


def test_device_decode_dynamic_count_padding():
    """count < cap: symbols past count stay 0 and the state advances
    exactly count symbols (the ladder's dynamic-count case)."""
    rng = np.random.default_rng(3)
    cdf, lengths = _random_bank(rng, 5, 8)
    n = 333
    idx = rng.integers(0, 5, n).astype(np.uint8)
    symbols = rng.integers(-3, 4, n).astype(np.int8)
    stream = _encode_y(cdf, lengths, symbols, idx, 8)
    lanes, _ = split_streams(stream, 8)
    cap = 1024
    decode = jax.jit(make_decode_fn(cdf, lengths, 8, cap))
    idx_pad = np.zeros(cap, np.uint8)
    idx_pad[:n] = idx
    _, got = decode(init_state(lanes), idx_pad, n)
    got = np.asarray(got)
    np.testing.assert_array_equal(got[:n], symbols)
    assert not got[n:].any()
