"""Bit-exact round-trip tests for the C++ rANS coder."""

import numpy as np
import pytest

from dcvc_tpu.entropy import (
    BitEstimator, GaussianConditional, MAX_ENTROPY_CODING_VALUE,
)
from dcvc_tpu.rans import (
    RansEncoder, RansDecoder, compact_i16, compact_u8, count_cond,
    scatter_i8, compute_ec_parallel,
)


@pytest.fixture(scope="module")
def y_bank():
    return GaussianConditional().compute_cdf_bank()


@pytest.fixture(scope="module")
def z_bank():
    import jax
    be = BitEstimator(qp_num=4, channel=8)
    params = be.init_params(jax.random.PRNGKey(7))
    return be.compute_cdf_bank(params, MAX_ENTROPY_CODING_VALUE)


def make_coders(y_bank, z_bank, parallel):
    enc = RansEncoder()
    dec = RansDecoder()
    for coder in (enc, dec):
        coder.set_cdf(z_bank[0], z_bank[1], 0)
        coder.set_cdf(y_bank[0], y_bank[1], 1)
        coder.set_parallel(parallel)
    return enc, dec


@pytest.mark.parametrize("parallel", [1, 2, 3, 4, 8])
def test_z_roundtrip(y_bank, z_bank, parallel):
    rng = np.random.default_rng(parallel)
    ch = 8
    qp = 2
    n = 5000
    symbols = rng.normal(0, 1.5, n).round().clip(-20, 20).astype(np.int8)

    enc, dec = make_coders(y_bank, z_bank, parallel)
    enc.reset()
    enc.encode_z(symbols, cdf_offset=qp * ch, ch=ch)
    enc.flush()
    stream = enc.get_encoded_stream()
    assert len(stream) > 0

    dec.set_stream(stream)
    dec.decode_z(n, cdf_offset=qp * ch, ch=ch)
    decoded = dec.get_decoded()
    np.testing.assert_array_equal(decoded, symbols)


@pytest.mark.parametrize("parallel", [1, 2, 5, 8])
def test_y_roundtrip(y_bank, z_bank, parallel):
    rng = np.random.default_rng(10 + parallel)
    n = 40000
    indexes = rng.integers(0, 128, n).astype(np.uint8)
    # scale-dependent symbols: larger index -> larger spread, with escapes
    spread = 0.11 * np.exp(indexes.astype(np.float64) / 127 * 5)
    symbols = rng.normal(0, spread).round().clip(-30, 30).astype(np.int16)
    combined = ((symbols.astype(np.int16) << 8)
                | indexes.astype(np.int16)).astype(np.int16)

    enc, dec = make_coders(y_bank, z_bank, parallel)
    enc.reset()
    enc.encode_y(combined)
    enc.flush()
    stream = enc.get_encoded_stream()

    dec.set_stream(stream)
    dec.decode_y(indexes)
    decoded = dec.get_decoded()
    np.testing.assert_array_equal(decoded.astype(np.int16), symbols)


def test_multi_shard_lifo_order(y_bank, z_bank):
    """4 y-steps encoded in reverse order + z; decode forward (the image
    codec's stream layout, reference dmci_proxy.cpp:396-420, 423-601)."""
    rng = np.random.default_rng(3)
    parallel = 4
    ch = 8
    qp = 1
    steps = []
    for _ in range(4):
        n = 3000
        idx = rng.integers(0, 128, n).astype(np.uint8)
        sym = rng.normal(0, 2, n).round().clip(-8, 8).astype(np.int16)
        steps.append((idx, sym))
    z_sym = rng.normal(0, 1, 4000).round().clip(-8, 8).astype(np.int8)

    enc, dec = make_coders(y_bank, z_bank, parallel)
    enc.reset()
    for idx, sym in reversed(steps):
        combined = ((sym << 8) | idx.astype(np.int16)).astype(np.int16)
        enc.encode_y(combined)
    enc.encode_z(z_sym, cdf_offset=qp * ch, ch=ch)
    enc.flush()
    stream = enc.get_encoded_stream()

    dec.set_stream(stream)
    dec.decode_z(z_sym.size, cdf_offset=qp * ch, ch=ch)
    np.testing.assert_array_equal(dec.get_decoded(), z_sym)
    for idx, sym in steps:
        dec.decode_y(idx)
        np.testing.assert_array_equal(dec.get_decoded().astype(np.int16), sym)


def test_compaction_helpers():
    rng = np.random.default_rng(0)
    n = 1000
    sym = rng.integers(-100, 100, n).astype(np.int16)
    idx = rng.integers(0, 128, n).astype(np.uint8)
    cond = (rng.random(n) > 0.4).astype(np.uint8)

    csym = compact_i16(sym, cond)
    cidx = compact_u8(idx, cond)
    k = count_cond(cond)
    assert csym.size == k == cidx.size
    np.testing.assert_array_equal(csym, sym[cond.astype(bool)])
    np.testing.assert_array_equal(cidx, idx[cond.astype(bool)])

    back = scatter_i8(csym.clip(-128, 127).astype(np.int8), cond)
    want = np.where(cond.astype(bool), sym.clip(-128, 127), 0).astype(np.int8)
    np.testing.assert_array_equal(back, want)


def test_skip_roundtrip(y_bank, z_bank):
    """Full skip pipeline: compact on encode, decode + scatter."""
    rng = np.random.default_rng(5)
    n = 20000
    idx = rng.integers(0, 128, n).astype(np.uint8)
    sym = rng.normal(0, 2, n).round().clip(-8, 8).astype(np.int16)
    cond = (rng.random(n) > 0.5).astype(np.uint8)
    sym = np.where(cond.astype(bool), sym, 0).astype(np.int16)

    combined = ((sym << 8) | idx.astype(np.int16)).astype(np.int16)
    coded = compact_i16(combined, cond)
    parallel = compute_ec_parallel(coded.size)

    enc, dec = make_coders(y_bank, z_bank, parallel)
    enc.reset()
    enc.encode_y(coded)
    enc.flush()
    stream = enc.get_encoded_stream()

    dec.set_stream(stream)
    dec.decode_y(compact_u8(idx, cond))
    decoded = scatter_i8(dec.get_decoded(), cond)
    np.testing.assert_array_equal(decoded.astype(np.int16), sym)


def test_compute_ec_parallel():
    assert compute_ec_parallel(100) == 1
    assert compute_ec_parallel(32768 * 3) == 3
    assert compute_ec_parallel(32768 * 100) == 8


def test_empty_and_reuse(y_bank, z_bank):
    enc, dec = make_coders(y_bank, z_bank, 1)
    for trial in range(3):
        rng = np.random.default_rng(trial)
        sym = rng.normal(0, 1, 500).round().clip(-8, 8).astype(np.int8)
        enc.reset()
        enc.encode_z(sym, cdf_offset=0, ch=8)
        enc.flush()
        stream = enc.get_encoded_stream()
        dec.set_stream(stream)
        dec.decode_z(sym.size, 0, 8)
        np.testing.assert_array_equal(dec.get_decoded(), sym)


def test_pathological_buffer_growth(y_bank, z_bank):
    """A huge maximum-entropy input must grow the per-lane encode buffer
    (initial capacity 1 MB) without corruption — guards the backward
    write path (EncLane::ensure_headroom, rans.cc)."""
    rng = np.random.default_rng(0)
    n = 3_000_000
    # extreme symbols: most escape to bypass coding (worst-case bytes)
    syms = rng.integers(-128, 128, n).astype(np.int8)
    idx = rng.integers(100, 128, n).astype(np.uint8)  # near-flat scales
    combined = ((syms.astype(np.int16) << 8)
                | idx.astype(np.int16)).astype(np.int16)

    enc, dec = make_coders(y_bank, z_bank, 1)
    enc.reset()
    enc.encode_y(combined)
    enc.flush()
    stream = enc.get_encoded_stream()
    assert len(stream) > 1 << 20   # really exceeded the initial buffer

    dec.set_stream(stream)
    dec.decode_y(idx)
    np.testing.assert_array_equal(dec.get_decoded(), syms)
