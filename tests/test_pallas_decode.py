"""Pallas rANS decoder conformance vs the host (C++) coder.

Mirrors tests/test_device_decode.py but exercises the Pallas kernel
(dcvc_tpu/rans/pallas_decode.py) in interpret mode on CPU — the same
streams, lane merges, bypass escapes, dynamic counts, and multi-call
state threading.  On real TPU the compiled kernel is additionally
covered by the device-EC codec tests when device_ec='pallas'."""

import numpy as np
import pytest
import jax

from dcvc_tpu.rans import RansEncoder, RansDecoder
from dcvc_tpu.rans.device_decode import split_streams, init_state
from dcvc_tpu.rans.pallas_decode import make_decode_fn_pallas

from test_device_decode import _random_bank, _encode_y


@pytest.mark.parametrize("n_lanes", [1, 2, 3, 5, 8])
def test_pallas_decode_y_matches_host(n_lanes):
    rng = np.random.default_rng(100 + n_lanes)
    cdf, lengths = _random_bank(rng, 7, 12)
    n = 1000 + n_lanes
    idx = rng.integers(0, 7, n).astype(np.uint8)
    symbols = rng.integers(-5, 6, n).astype(np.int8)
    esc = rng.random(n) < 0.02
    symbols[esc] = rng.integers(30, 120, esc.sum())
    stream = _encode_y(cdf, lengths, symbols, idx, n_lanes)

    dec = RansDecoder()
    dec.set_cdf(cdf, lengths, 1)
    dec.set_parallel(n_lanes)
    dec.set_stream(stream)
    dec.decode_y(idx)
    want = dec.get_decoded(n)

    lanes, _ = split_streams(stream, n_lanes)
    cap = n + 16
    decode = jax.jit(make_decode_fn_pallas(cdf, lengths, n_lanes, cap,
                                           chunk=128, interpret=True))
    idx_pad = np.zeros(cap, np.uint8)
    idx_pad[:n] = idx
    _, got = decode(init_state(lanes), idx_pad, n)
    got = np.asarray(got)[:n]
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, symbols.astype(np.int8))


def test_pallas_decode_threads_state_and_pads():
    """z-bank + two y rungs through one state (the ladder pattern),
    with dynamic counts < cap and zero padding past count."""
    rng = np.random.default_rng(17)
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

    lanes, _ = split_streams(stream, n_lanes)
    state = init_state(lanes)
    zidx = ((np.arange(nz) % ch) + 2 * ch).astype(np.int32)
    dz = jax.jit(make_decode_fn_pallas(z_cdf, z_len, n_lanes, nz,
                                       chunk=64, interpret=True))
    cap = 1024
    dy = jax.jit(make_decode_fn_pallas(y_cdf, y_len, n_lanes, cap,
                                       chunk=128, interpret=True))
    state, gz = dz(state, zidx, nz)
    pad1 = np.zeros(cap, np.uint8)
    pad1[:ny1] = i1
    state, g1 = dy(state, pad1, ny1)
    pad2 = np.zeros(cap, np.uint8)
    pad2[:ny2] = i2
    state, g2 = dy(state, pad2, ny2)
    np.testing.assert_array_equal(np.asarray(gz), z)
    g1 = np.asarray(g1)
    g2 = np.asarray(g2)
    np.testing.assert_array_equal(g1[:ny1], s1)
    np.testing.assert_array_equal(g2[:ny2], s2)
    assert not g1[ny1:].any() and not g2[ny2:].any()


def test_pallas_decode_tiny_count():
    """count < n_lanes (size0 == 0: all symbols in the last lane)."""
    rng = np.random.default_rng(5)
    cdf, lengths = _random_bank(rng, 3, 6)
    n = 5
    idx = rng.integers(0, 3, n).astype(np.uint8)
    symbols = rng.integers(-2, 3, n).astype(np.int8)
    stream = _encode_y(cdf, lengths, symbols, idx, 8)
    lanes, _ = split_streams(stream, 8)
    cap = 256
    decode = jax.jit(make_decode_fn_pallas(cdf, lengths, 8, cap,
                                           chunk=64, interpret=True))
    idx_pad = np.zeros(cap, np.uint8)
    idx_pad[:n] = idx
    _, got = decode(init_state(lanes), idx_pad, n)
    got = np.asarray(got)
    np.testing.assert_array_equal(got[:n], symbols)
    assert not got[n:].any()
