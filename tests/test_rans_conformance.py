"""Cross-conformance: our indexed rANS vs the reference coder.

Compiles the reference's torch-free rans core
(DCVC-family/DCVC-FM/src/cpp/rans/rans.cpp) with a small extern-C shim
at test time and asserts byte-level interoperability in both directions:
our encoder's stream decodes in their decoder and vice versa.
Skipped when the reference tree or a C++ toolchain is unavailable.
"""

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

REF_RANS = "/root/reference/DCVC-family/DCVC-FM/src/cpp/rans"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_RANS, "rans.cpp"))
    or shutil.which("g++") is None,
    reason="reference rans sources or g++ unavailable")

_SHIM = r"""
#include "rans.h"
#include <memory>
#include <vector>
#include <cstring>

extern "C" {

void* ref_enc_new() { return new RansEncoderLib(); }
void ref_enc_free(void* h) { delete static_cast<RansEncoderLib*>(h); }

int ref_enc_add_cdf(void* h, const int32_t* cdfs, int n, int per,
                    const int32_t* sizes, const int32_t* offsets) {
    auto rows = std::make_shared<std::vector<std::vector<int32_t>>>();
    for (int i = 0; i < n; i++) {
        rows->emplace_back(cdfs + (size_t)i * per,
                           cdfs + (size_t)(i + 1) * per);
    }
    auto sz = std::make_shared<std::vector<int32_t>>(sizes, sizes + n);
    auto off = std::make_shared<std::vector<int32_t>>(offsets, offsets + n);
    return static_cast<RansEncoderLib*>(h)->add_cdf(rows, sz, off);
}

void ref_enc_encode(void* h, const int16_t* symbols, const int16_t* indexes,
                    int n, int group) {
    auto sy = std::make_shared<std::vector<int16_t>>(symbols, symbols + n);
    auto ix = std::make_shared<std::vector<int16_t>>(indexes, indexes + n);
    static_cast<RansEncoderLib*>(h)->encode_with_indexes(sy, ix, group);
}

void ref_enc_reset(void* h) { static_cast<RansEncoderLib*>(h)->reset(); }
void ref_enc_flush(void* h) { static_cast<RansEncoderLib*>(h)->flush(); }

int ref_enc_get_stream(void* h, uint8_t* out, int cap) {
    auto s = static_cast<RansEncoderLib*>(h)->get_encoded_stream();
    if (out && (int)s.size() <= cap) std::memcpy(out, s.data(), s.size());
    return (int)s.size();
}

void* ref_dec_new() { return new RansDecoderLib(); }
void ref_dec_free(void* h) { delete static_cast<RansDecoderLib*>(h); }

int ref_dec_add_cdf(void* h, const int32_t* cdfs, int n, int per,
                    const int32_t* sizes, const int32_t* offsets) {
    auto rows = std::make_shared<std::vector<std::vector<int32_t>>>();
    for (int i = 0; i < n; i++) {
        rows->emplace_back(cdfs + (size_t)i * per,
                           cdfs + (size_t)(i + 1) * per);
    }
    auto sz = std::make_shared<std::vector<int32_t>>(sizes, sizes + n);
    auto off = std::make_shared<std::vector<int32_t>>(offsets, offsets + n);
    return static_cast<RansDecoderLib*>(h)->add_cdf(rows, sz, off);
}

void ref_dec_set_stream(void* h, const uint8_t* data, int n) {
    auto s = std::make_shared<std::vector<uint8_t>>(data, data + n);
    static_cast<RansDecoderLib*>(h)->set_stream(s);
}

void ref_dec_decode(void* h, const int16_t* indexes, int n, int group,
                    int16_t* out) {
    auto ix = std::make_shared<std::vector<int16_t>>(indexes, indexes + n);
    auto r = static_cast<RansDecoderLib*>(h)->decode_stream(ix, group);
    std::memcpy(out, r.data(), r.size() * sizeof(int16_t));
}

}
"""


@pytest.fixture(scope="module")
def ref_lib(tmp_path_factory):
    d = tmp_path_factory.mktemp("refrans")
    shim = d / "shim.cpp"
    shim.write_text(_SHIM)
    so = d / "librefrans.so"
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-I", REF_RANS, "-o", str(so), str(shim),
           os.path.join(REF_RANS, "rans.cpp")]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"reference rans does not build: {proc.stderr[-500:]}")
    lib = ctypes.CDLL(str(so))
    c = ctypes
    for name, (argtypes, restype) in {
        "ref_enc_new": ([], c.c_void_p),
        "ref_enc_free": ([c.c_void_p], None),
        "ref_enc_add_cdf": ([c.c_void_p, c.c_void_p, c.c_int, c.c_int,
                             c.c_void_p, c.c_void_p], c.c_int),
        "ref_enc_encode": ([c.c_void_p, c.c_void_p, c.c_void_p, c.c_int,
                            c.c_int], None),
        "ref_enc_reset": ([c.c_void_p], None),
        "ref_enc_flush": ([c.c_void_p], None),
        "ref_enc_get_stream": ([c.c_void_p, c.c_void_p, c.c_int], c.c_int),
        "ref_dec_new": ([], c.c_void_p),
        "ref_dec_free": ([c.c_void_p], None),
        "ref_dec_add_cdf": ([c.c_void_p, c.c_void_p, c.c_int, c.c_int,
                             c.c_void_p, c.c_void_p], c.c_int),
        "ref_dec_set_stream": ([c.c_void_p, c.c_void_p, c.c_int], None),
        "ref_dec_decode": ([c.c_void_p, c.c_void_p, c.c_int, c.c_int,
                            c.c_void_p], None),
    }.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = restype
    return lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def _make_bank(rng, n_rows=6, bins=13):
    def make_cdf(pmf):
        pmf = pmf / pmf.sum()
        freq = np.maximum(1, np.round(pmf * ((1 << 16) - len(pmf)))) \
            .astype(np.int64)
        while freq.sum() > (1 << 16):
            freq[np.argmax(freq)] -= 1
        while freq.sum() < (1 << 16):
            freq[np.argmax(freq)] += 1
        cdf = np.zeros(len(pmf) + 1, np.int32)
        cdf[1:] = np.cumsum(freq)
        return cdf

    rows = [make_cdf(rng.random(bins - 1) + 0.05) for _ in range(n_rows)]
    per = max(len(r) for r in rows)
    cdfs = np.zeros((n_rows, per), np.int32)
    for i, r in enumerate(rows):
        cdfs[i, :len(r)] = r
    sizes = np.array([len(r) for r in rows], np.int32)
    offsets = rng.integers(-6, 3, n_rows).astype(np.int32)
    return cdfs, sizes, offsets


def _symbols(rng, offsets, n=4000, n_rows=6):
    indexes = rng.integers(0, n_rows, n).astype(np.int16)
    indexes[rng.random(n) < 0.08] = -1
    symbols = (rng.integers(-7, 8, n)
               + offsets[np.clip(indexes, 0, None)]).astype(np.int16)
    symbols[rng.random(n) < 0.02] = 300     # bypass escapes
    symbols[rng.random(n) < 0.02] = -255
    return symbols, indexes


def test_ours_encodes_theirs_decodes(ref_lib):
    from dcvc_tpu import rans
    rng = np.random.default_rng(1)
    cdfs, sizes, offsets = _make_bank(rng)
    symbols, indexes = _symbols(rng, offsets)

    enc = rans.IndexedRansEncoder()
    g = enc.add_cdf(cdfs, sizes, offsets)
    enc.reset()
    enc.encode_with_indexes(symbols, indexes, g)
    enc.flush()
    stream = np.frombuffer(enc.get_encoded_stream(), np.uint8)

    dec = ref_lib.ref_dec_new()
    gd = ref_lib.ref_dec_add_cdf(dec, _ptr(cdfs), cdfs.shape[0],
                                 cdfs.shape[1], _ptr(sizes), _ptr(offsets))
    s = np.ascontiguousarray(stream)
    ref_lib.ref_dec_set_stream(dec, _ptr(s), s.size)
    out = np.empty(indexes.size, np.int16)
    ref_lib.ref_dec_decode(dec, _ptr(indexes), indexes.size, gd, _ptr(out))
    ref_lib.ref_dec_free(dec)

    want = symbols.copy()
    want[indexes < 0] = 0
    np.testing.assert_array_equal(out, want)


def test_theirs_encodes_ours_decodes(ref_lib):
    from dcvc_tpu import rans
    rng = np.random.default_rng(2)
    cdfs, sizes, offsets = _make_bank(rng)
    symbols, indexes = _symbols(rng, offsets)

    enc = ref_lib.ref_enc_new()
    g = ref_lib.ref_enc_add_cdf(enc, _ptr(cdfs), cdfs.shape[0],
                                cdfs.shape[1], _ptr(sizes), _ptr(offsets))
    ref_lib.ref_enc_reset(enc)
    ref_lib.ref_enc_encode(enc, _ptr(symbols), _ptr(indexes),
                           symbols.size, g)
    ref_lib.ref_enc_flush(enc)
    cap = symbols.size * 4 + 16
    buf = np.empty(cap, np.uint8)
    size = ref_lib.ref_enc_get_stream(enc, _ptr(buf), cap)
    ref_lib.ref_enc_free(enc)
    stream = buf[:size].tobytes()

    dec = rans.IndexedRansDecoder()
    gd = dec.add_cdf(cdfs, sizes, offsets)
    dec.set_stream(stream)
    out = dec.decode_stream(indexes, gd)

    want = symbols.copy()
    want[indexes < 0] = 0
    np.testing.assert_array_equal(out, want)


def test_streams_byte_identical(ref_lib):
    """Same inputs -> byte-identical streams from both encoders."""
    from dcvc_tpu import rans
    rng = np.random.default_rng(3)
    cdfs, sizes, offsets = _make_bank(rng)
    symbols, indexes = _symbols(rng, offsets)

    ours = rans.IndexedRansEncoder()
    g = ours.add_cdf(cdfs, sizes, offsets)
    ours.reset()
    ours.encode_with_indexes(symbols, indexes, g)
    ours.flush()
    a = ours.get_encoded_stream()

    enc = ref_lib.ref_enc_new()
    ref_lib.ref_enc_add_cdf(enc, _ptr(cdfs), cdfs.shape[0], cdfs.shape[1],
                            _ptr(sizes), _ptr(offsets))
    ref_lib.ref_enc_reset(enc)
    ref_lib.ref_enc_encode(enc, _ptr(symbols), _ptr(indexes),
                           symbols.size, 0)
    ref_lib.ref_enc_flush(enc)
    cap = symbols.size * 4 + 16
    buf = np.empty(cap, np.uint8)
    size = ref_lib.ref_enc_get_stream(enc, _ptr(buf), cap)
    ref_lib.ref_enc_free(enc)
    b = buf[:size].tobytes()

    assert a == b
