"""Cross-conformance: our flagship rANS coder vs the reference DCVC-UF
py_rans coder (src/cpp/py_rans/{rans,py_rans}.cpp) at the byte level.

The reference module is compiled at test time as a real pybind11
extension (headers vendored by torch) with a thin test-only binding that
additionally exposes the decoded tensor to Python.  Covered, in both
directions plus byte-identity of the encoded streams:
  * y path: int16 combined symbols (value<<8 | cdf_idx), 128-row bank
    (py_rans.cpp:104-123, rans.cpp:239-263)
  * z path: int8 symbols, per-QP CDF banks via cdf_offset = qp*ch
    (py_rans.cpp:125-146, rans.cpp:276-300)
  * bypass escapes beyond max_value (rans.cpp:144-181)
  * N-way lane merging for N in {1,2,3,5,8}: paired forward/reversed
    streams with shared-trailing-zero overlap and the int32
    cumulative-offset header when N>=3 (py_rans.cpp:156-249,412-492)

Skipped when the reference tree or a C++ toolchain is unavailable.
"""

import os
import shutil
import subprocess
import sys
import sysconfig

import numpy as np
import pytest

REF_PY_RANS = "/root/reference/src/cpp/py_rans"


def _pybind11_include():
    try:
        import torch
        inc = os.path.join(os.path.dirname(torch.__file__), "include")
        if os.path.isdir(os.path.join(inc, "pybind11")):
            return inc
    except ImportError:
        pass
    return None


pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_PY_RANS, "py_rans.cpp"))
    or shutil.which("g++") is None
    or _pybind11_include() is None,
    reason="reference py_rans sources, g++, or pybind11 headers unavailable")

# Test-only binding: wraps the reference classes and surfaces the decoded
# tensor (the reference exposes it C++-side only, py_rans.h:64).
_SHIM = r"""
#include "py_rans.h"
#include <pybind11/numpy.h>
#include <pybind11/pybind11.h>

namespace py = pybind11;

static py::array_t<int8_t> dec_get_decoded(RansDecoder &dec, int n) {
    auto t = dec.get_decoded_tensor_cpp();
    py::array_t<int8_t> out({n}, {sizeof(int8_t)});
    std::memcpy(out.request().ptr, t->data(), n);
    return out;
}

PYBIND11_MODULE(ref_uf_rans, m) {
    py::class_<RansEncoder>(m, "RansEncoder")
        .def(py::init<>())
        .def("encode_y", py::overload_cast<const py::array_t<int16_t>&>(
                             &RansEncoder::encode_y))
        .def("encode_z",
             py::overload_cast<const py::array_t<int8_t>&, const int,
                               const int>(&RansEncoder::encode_z))
        .def("flush", &RansEncoder::flush)
        .def("get_encoded_stream", &RansEncoder::get_encoded_stream)
        .def("reset", &RansEncoder::reset)
        .def("set_cdf",
             py::overload_cast<const py::array_t<int32_t>&,
                               const py::array_t<int32_t>&, const int>(
                 &RansEncoder::set_cdf))
        .def("set_entropy_coder_parallel",
             &RansEncoder::set_entropy_coder_parallel);

    py::class_<RansDecoder>(m, "RansDecoder")
        .def(py::init<>())
        .def("set_stream", py::overload_cast<const py::array_t<uint8_t>&>(
                               &RansDecoder::set_stream))
        .def("decode_y", py::overload_cast<const py::array_t<uint8_t>&>(
                             &RansDecoder::decode_y))
        .def("decode_z", &RansDecoder::decode_z)
        .def("set_cdf",
             py::overload_cast<const py::array_t<int32_t>&,
                               const py::array_t<int32_t>&, const int>(
                 &RansDecoder::set_cdf))
        .def("set_entropy_coder_parallel",
             &RansDecoder::set_entropy_coder_parallel)
        .def("get_decoded", &dec_get_decoded);
}
"""


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_uf_rans")
    shim = d / "shim.cpp"
    shim.write_text(_SHIM)
    so = d / "ref_uf_rans.so"
    cmd = ["g++", "-O1", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-I", REF_PY_RANS,
           "-I", _pybind11_include(),
           "-I", sysconfig.get_paths()["include"],
           "-o", str(so), str(shim),
           os.path.join(REF_PY_RANS, "py_rans.cpp"),
           os.path.join(REF_PY_RANS, "rans.cpp")]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"reference py_rans does not build: {proc.stderr[-800:]}")
    sys.path.insert(0, str(d))
    try:
        import ref_uf_rans
    finally:
        sys.path.pop(0)
    return ref_uf_rans


# ---- bank construction (shared by both coders, so byte-identity of the
# ---- streams is purely a coder-behavior check)

def _quantized_row(pmf):
    from dcvc_tpu.entropy.cdf import pmf_to_quantized_cdf
    return pmf_to_quantized_cdf(np.asarray(pmf, np.float32)
                                / np.sum(pmf, dtype=np.float32))


def _make_bank(rng, n_rows, bins_lo, bins_hi):
    """Bank of n_rows quantized CDFs with per-row sizes in
    [bins_lo, bins_hi]; returns (cdfs 2D int32, sizes int32)."""
    sizes = rng.integers(bins_lo, bins_hi + 1, n_rows).astype(np.int32)
    per = int(sizes.max())
    cdfs = np.zeros((n_rows, per), np.int32)
    for i, sz in enumerate(sizes):
        # geometric-ish pmf in zig-zag order (0,+1,-1,...): realistic
        # shape for quantized-gaussian residuals, incl. a bypass tail
        p = 0.5 ** np.arange(sz - 1) + 1e-4
        cdfs[i, :sz] = _quantized_row(p)
    return cdfs, sizes


def _y_inputs(rng, n, n_rows, sizes, escape_frac=0.02):
    """Combined int16 y symbols: (value<<8)|cdf_idx with values inside
    each row's coding range plus a fraction of bypass escapes."""
    idx = rng.integers(0, n_rows, n).astype(np.uint8)
    max_v = (sizes[idx] - 2).astype(np.int32)  # rans.cpp max_value
    # signed symbol s with zig-zag |2s|-(s>0) < max_value (non-escape)
    lim = np.maximum(1, (max_v - 1) // 2)
    s = rng.integers(-100, 101, n) % (2 * lim + 1) - lim
    esc = rng.random(n) < escape_frac
    s = np.where(esc, rng.integers(20, 120, n) * rng.choice([-1, 1], n), s)
    s = np.clip(s, -128, 127).astype(np.int8)
    combined = ((s.astype(np.int16) << 8)
                | idx.astype(np.int16) & 0xFF).astype(np.int16)
    return combined, idx, s


def _ours():
    from dcvc_tpu import rans
    return rans


@pytest.mark.parametrize("n_lanes", [1, 2, 3, 5, 8])
def test_y_cross_conformance(ref, n_lanes):
    rans = _ours()
    rng = np.random.default_rng(100 + n_lanes)
    n_rows = 128
    cdfs, sizes = _make_bank(rng, n_rows, 4, 18)
    n = 4096 * n_lanes + rng.integers(0, 97)
    combined, idx, s = _y_inputs(rng, n, n_rows, sizes)

    # ours encode -> bytes identical + reference decodes
    enc = rans.RansEncoder()
    enc.set_cdf(cdfs, sizes, 1)
    enc.set_parallel(n_lanes)
    enc.reset()
    enc.encode_y(combined)
    enc.flush()
    ours_stream = enc.get_encoded_stream()

    renc = ref.RansEncoder()
    renc.set_cdf(cdfs, sizes, 1)
    renc.set_entropy_coder_parallel(n_lanes)
    renc.reset()
    renc.encode_y(combined)
    renc.flush()
    ref_stream = np.asarray(renc.get_encoded_stream()).tobytes()

    assert ours_stream == ref_stream, (
        f"streams differ at {n_lanes} lanes: "
        f"{len(ours_stream)} vs {len(ref_stream)} bytes")

    rdec = ref.RansDecoder()
    rdec.set_cdf(cdfs, sizes, 1)
    rdec.set_entropy_coder_parallel(n_lanes)
    rdec.set_stream(np.frombuffer(ours_stream, np.uint8))
    rdec.decode_y(idx)
    out = np.asarray(rdec.get_decoded(n))
    np.testing.assert_array_equal(out, s)

    # reference encode -> our decoder
    dec = rans.RansDecoder()
    dec.set_cdf(cdfs, sizes, 1)
    dec.set_parallel(n_lanes)
    dec.set_stream(ref_stream)
    dec.decode_y(idx)
    np.testing.assert_array_equal(dec.get_decoded(n), s)


@pytest.mark.parametrize("n_lanes", [1, 3, 8])
def test_z_per_qp_banks(ref, n_lanes):
    """z path: per-channel CDF rows selected by (i % ch) + cdf_offset,
    with the offset picking a QP's 128-row slice of the bank."""
    rans = _ours()
    rng = np.random.default_rng(200 + n_lanes)
    ch, qp_num = 32, 4
    cdfs, sizes = _make_bank(rng, ch * qp_num, 4, 12)
    n = 2048 * max(n_lanes, 2) + 13
    qp = int(rng.integers(0, qp_num))
    cdf_offset = qp * ch
    rows = (np.arange(n) % ch) + cdf_offset
    max_v = (sizes[rows] - 2).astype(np.int32)
    lim = np.maximum(1, (max_v - 1) // 2)
    s = (rng.integers(-100, 101, n) % (2 * lim + 1) - lim).astype(np.int8)
    esc = rng.random(n) < 0.03
    s = np.where(esc, rng.integers(10, 100, n).astype(np.int8), s)

    enc = rans.RansEncoder()
    enc.set_cdf(cdfs, sizes, 0)
    enc.set_parallel(n_lanes)
    enc.reset()
    enc.encode_z(s, cdf_offset, ch)
    enc.flush()
    ours_stream = enc.get_encoded_stream()

    renc = ref.RansEncoder()
    renc.set_cdf(cdfs, sizes, 0)
    renc.set_entropy_coder_parallel(n_lanes)
    renc.reset()
    renc.encode_z(s, cdf_offset, ch)
    renc.flush()
    ref_stream = np.asarray(renc.get_encoded_stream()).tobytes()

    assert ours_stream == ref_stream

    rdec = ref.RansDecoder()
    rdec.set_cdf(cdfs, sizes, 0)
    rdec.set_entropy_coder_parallel(n_lanes)
    rdec.set_stream(np.frombuffer(ours_stream, np.uint8))
    rdec.decode_z(n, cdf_offset, ch)
    np.testing.assert_array_equal(np.asarray(rdec.get_decoded(n)), s)

    dec = rans.RansDecoder()
    dec.set_cdf(cdfs, sizes, 0)
    dec.set_parallel(n_lanes)
    dec.set_stream(ref_stream)
    dec.decode_z(n, cdf_offset, ch)
    np.testing.assert_array_equal(dec.get_decoded(n), s)


def test_bypass_escape_heavy(ref):
    """Stress the escape path: most symbols beyond max_value, forcing
    multi-chunk 2-bit bypass with unary-ish bypass counts."""
    rans = _ours()
    rng = np.random.default_rng(7)
    n_rows = 8
    cdfs, sizes = _make_bank(rng, n_rows, 4, 6)  # tiny ranges -> escapes
    n = 9000
    idx = rng.integers(0, n_rows, n).astype(np.uint8)
    s = rng.integers(-127, 128, n).astype(np.int8)  # mostly escapes
    combined = ((s.astype(np.int16) << 8)
                | idx.astype(np.int16) & 0xFF).astype(np.int16)

    enc = rans.RansEncoder()
    enc.set_cdf(cdfs, sizes, 1)
    enc.set_parallel(2)
    enc.reset()
    enc.encode_y(combined)
    enc.flush()
    ours_stream = enc.get_encoded_stream()

    renc = ref.RansEncoder()
    renc.set_cdf(cdfs, sizes, 1)
    renc.set_entropy_coder_parallel(2)
    renc.reset()
    renc.encode_y(combined)
    renc.flush()
    assert ours_stream == np.asarray(renc.get_encoded_stream()).tobytes()

    rdec = ref.RansDecoder()
    rdec.set_cdf(cdfs, sizes, 1)
    rdec.set_entropy_coder_parallel(2)
    rdec.set_stream(np.frombuffer(ours_stream, np.uint8))
    rdec.decode_y(idx)
    np.testing.assert_array_equal(np.asarray(rdec.get_decoded(n)), s)


def test_y_then_z_interleaved_stream(ref):
    """A frame-shaped payload: y encoded then z in one stream (the order
    the proxies produce, dmci_proxy.cpp:818-845) decodes in both
    decoders.  rANS is LIFO, so the decode order is z FIRST then y —
    which is exactly why the reference decode ladder starts with z
    (dmci_proxy.cpp:423-602)."""
    rans = _ours()
    rng = np.random.default_rng(11)
    ycdfs, ysizes = _make_bank(rng, 128, 4, 18)
    ch = 16
    zcdfs, zsizes = _make_bank(rng, ch * 2, 4, 12)
    n_lanes = 4

    ny, nz = 70000, 3000
    combined, idx, sy = _y_inputs(rng, ny, 128, ysizes)
    rows = (np.arange(nz) % ch) + ch  # qp bank 1
    lim = np.maximum(1, (zsizes[rows] - 3) // 2)
    sz = (rng.integers(-50, 51, nz) % (2 * lim + 1) - lim).astype(np.int8)

    def encode(e, set_par):
        e.set_cdf(zcdfs, zsizes, 0)
        e.set_cdf(ycdfs, ysizes, 1)
        set_par(n_lanes)
        e.reset()
        e.encode_y(combined)
        e.encode_z(sz, ch, ch)
        e.flush()

    enc = rans.RansEncoder()
    encode(enc, enc.set_parallel)
    a = enc.get_encoded_stream()
    renc = ref.RansEncoder()
    encode(renc, renc.set_entropy_coder_parallel)
    b = np.asarray(renc.get_encoded_stream()).tobytes()
    assert a == b

    for which in ("ours", "ref"):
        if which == "ours":
            d = rans.RansDecoder()
            d.set_cdf(zcdfs, zsizes, 0)
            d.set_cdf(ycdfs, ysizes, 1)
            d.set_parallel(n_lanes)
            d.set_stream(a)
            d.decode_z(nz, ch, ch)
            got_z = d.get_decoded(nz)
            d.decode_y(idx)
            got_y = d.get_decoded(ny)
        else:
            d = ref.RansDecoder()
            d.set_cdf(zcdfs, zsizes, 0)
            d.set_cdf(ycdfs, ysizes, 1)
            d.set_entropy_coder_parallel(n_lanes)
            d.set_stream(np.frombuffer(a, np.uint8))
            d.decode_z(nz, ch, ch)
            got_z = np.asarray(d.get_decoded(nz))
            d.decode_y(idx)
            got_y = np.asarray(d.get_decoded(ny))
        np.testing.assert_array_equal(got_y, sy, err_msg=which)
        np.testing.assert_array_equal(got_z, sz, err_msg=which)
