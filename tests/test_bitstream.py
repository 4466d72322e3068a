"""Bitstream conformance tests: byte-identical to the reference syntax
(oracle values recomputed from the format spec in SURVEY.md / reference
stream_helper.py)."""

import io

import pytest

from dcvc_tpu.bitstream import (
    NalType, SPSHelper, read_header, read_sps_remaining, read_ip_remaining,
    write_sps, write_ip, read_uint_adaptive, write_uint_adaptive,
)


@pytest.mark.parametrize("value,nbytes", [
    (0, 1), (127, 1), (128, 2), (16383, 2), (16384, 4), ((1 << 30) - 1, 4),
])
def test_uint_adaptive_roundtrip(value, nbytes):
    buf = io.BytesIO()
    assert write_uint_adaptive(buf, value) == nbytes
    buf.seek(0)
    assert read_uint_adaptive(buf) == value


def test_uint_adaptive_exact_bytes():
    buf = io.BytesIO()
    write_uint_adaptive(buf, 5)
    assert buf.getvalue() == bytes([5])
    buf = io.BytesIO()
    write_uint_adaptive(buf, 300)  # 0b10 tag | high byte, low byte
    assert buf.getvalue() == bytes([(300 >> 8) | 0x80, 300 & 0xFF])
    buf = io.BytesIO()
    write_uint_adaptive(buf, 1 << 20)
    v = 1 << 20
    assert buf.getvalue() == bytes([
        ((v >> 24) & 0xFF) | 0xC0, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF])


def test_sps_roundtrip():
    buf = io.BytesIO()
    sps = {"sps_id": 3, "height": 1080, "width": 1920}
    write_sps(buf, sps)
    buf.seek(0)
    header = read_header(buf)
    assert header["nal_type"] == NalType.NAL_SPS
    assert header["sps_id"] == 3
    got = read_sps_remaining(buf, header["sps_id"])
    assert got == sps


def test_ip_roundtrip():
    buf = io.BytesIO()
    payload = bytes(range(256)) * 3
    write_ip(buf, True, 2, qp=37, ec_part=5, reset_feature_memory=1,
             bit_stream=payload)
    write_ip(buf, False, 2, qp=12, ec_part=8, reset_feature_memory=0,
             bit_stream=b"\x01\x02")
    buf.seek(0)

    h = read_header(buf)
    assert h["nal_type"] == NalType.NAL_I and h["sps_id"] == 2
    qp, ec_part, reset, stream = read_ip_remaining(buf)
    assert (qp, ec_part, reset) == (37, 5, 1)
    assert stream == payload

    h = read_header(buf)
    assert h["nal_type"] == NalType.NAL_P
    qp, ec_part, reset, stream = read_ip_remaining(buf)
    assert (qp, ec_part, reset) == (12, 8, 0)
    assert stream == b"\x01\x02"


def test_sps_helper_dedupe():
    helper = SPSHelper()
    id0, new0 = helper.get_sps_id({"height": 1080, "width": 1920})
    assert (id0, new0) == (0, True)
    id1, new1 = helper.get_sps_id({"height": 1080, "width": 1920})
    assert (id1, new1) == (0, False)
    id2, new2 = helper.get_sps_id({"height": 720, "width": 1280})
    assert (id2, new2) == (1, True)
    assert helper.get_sps_by_id(1)["height"] == 720
