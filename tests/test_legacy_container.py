"""Byte-conformance of the legacy per-frame `.bin` containers vs the
reference stream_helper implementations (pure python + struct, imported
directly from the reference tree and cross-checked in both directions).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from dcvc_tpu.bitstream import legacy_container as lc

REF = "/root/reference/DCVC-family"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def _load_ref(model):
    """Import DCVC-family/<model>/src/utils/stream_helper.py standalone."""
    path = os.path.join(REF, model, "src", "utils", "stream_helper.py")
    spec = importlib.util.spec_from_file_location(f"ref_sh_{model}", path)
    mod = importlib.util.module_from_spec(spec)
    if "torchvision" not in sys.modules:  # DCVC's imports it for one F.pad
        import types
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.ToPILImage = object
        tv.transforms.ToTensor = object
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    try:
        spec.loader.exec_module(mod)
    except ImportError as e:  # some import torch at module level
        pytest.skip(f"reference stream_helper needs {e.name}")
    return mod


def _payload(n, seed):
    return np.random.default_rng(seed).integers(
        0, 256, n, dtype=np.uint8).tobytes()


def test_dcvc_i_and_p(tmp_path):
    ref = _load_ref("DCVC")
    y, z = _payload(1000, 0), _payload(77, 1)
    ours, theirs = tmp_path / "a.bin", tmp_path / "b.bin"
    lc.dcvc_encode_i(256, 448, y, z, str(ours))
    ref.encode_i(256, 448, y, z, str(theirs))
    assert ours.read_bytes() == theirs.read_bytes()
    assert lc.dcvc_decode_i(str(theirs)) == (256, 448, y, z)

    mvy, mvz = _payload(300, 2), _payload(40, 3)
    lc.dcvc_encode_p(256, 448, mvy, mvz, y, z, str(ours))
    ref.encode_p(256, 448, mvy, mvz, y, z, str(theirs))
    assert ours.read_bytes() == theirs.read_bytes()
    assert lc.dcvc_decode_p(str(theirs)) == (256, 448, mvy, mvz, y, z)


def test_tcm_p(tmp_path):
    ref = _load_ref("DCVC-TCM")
    s = _payload(513, 4)
    ours, theirs = tmp_path / "a.bin", tmp_path / "b.bin"
    lc.tcm_encode_p(s, str(ours))
    ref.encode_p(s, str(theirs))
    assert ours.read_bytes() == theirs.read_bytes()
    assert lc.tcm_decode_p(str(theirs)) == s


def test_hem_i_and_p(tmp_path):
    ref = _load_ref("DCVC-HEM")
    s = _payload(800, 5)
    ours, theirs = tmp_path / "a.bin", tmp_path / "b.bin"
    lc.hem_encode_i(1080, 1920, 21, s, str(ours))
    ref.encode_i(1080, 1920, 21, s, str(theirs))
    assert ours.read_bytes() == theirs.read_bytes()
    assert lc.hem_decode_i(str(theirs)) == (1080, 1920, 21, s)

    lc.hem_encode_p(s, 17, 40, str(ours))
    ref.encode_p(s, 17, 40, str(theirs))
    assert ours.read_bytes() == theirs.read_bytes()
    assert lc.hem_decode_p(str(theirs)) == (17, 40, s)


def test_dc_i_and_p(tmp_path):
    ref = _load_ref("DCVC-DC")
    s = _payload(650, 6)
    ours, theirs = tmp_path / "a.bin", tmp_path / "b.bin"
    lc.dc_encode_i(1080, 1920, True, 37, s, str(ours))
    ref.encode_i(1080, 1920, True, 37, s, str(theirs))
    assert ours.read_bytes() == theirs.read_bytes()
    assert lc.dc_decode_i(str(theirs)) == (1080, 1920, True, 37, s)

    lc.dc_encode_p(s, False, 21, 3, str(ours))
    ref.encode_p(s, False, 21, 3, str(theirs))
    assert ours.read_bytes() == theirs.read_bytes()
    assert lc.dc_decode_p(str(theirs)) == (False, 21, 3, s)


def test_fm_nal_sps_ip(tmp_path):
    ref = _load_ref("DCVC-FM")
    sps = {"sps_id": 2, "height": 1080, "width": 1920, "qp": 45, "fa_idx": 1}
    s = _payload(40000, 7)  # > 32767 exercises the 4-byte length
    ours, theirs = tmp_path / "a.bin", tmp_path / "b.bin"
    with open(ours, "wb") as f:
        lc.fm_write_sps(f, sps)
        lc.fm_write_ip(f, True, 2, s)
        lc.fm_write_ip(f, False, 2, _payload(120, 8))
    with open(theirs, "wb") as f:
        ref.write_sps(f, sps)
        ref.write_ip(f, True, 2, s)
        ref.write_ip(f, False, 2, _payload(120, 8))
    assert ours.read_bytes() == theirs.read_bytes()

    with open(theirs, "rb") as f:
        h = lc.fm_read_header(f)
        assert h["nal_type"] == lc.FM_NAL_SPS
        got = lc.fm_read_sps_remaining(f, h["sps_id"])
        assert got == sps
        h = lc.fm_read_header(f)
        assert h["nal_type"] == lc.FM_NAL_I and h["sps_id"] == 2
        assert lc.fm_read_ip_remaining(f) == s
        h = lc.fm_read_header(f)
        assert h["nal_type"] == lc.FM_NAL_P
        assert lc.fm_read_ip_remaining(f) == _payload(120, 8)


def test_fm_sps_helper_dedupe():
    helper = lc.FMSPSHelper()
    a = {"height": 1080, "width": 1920, "qp": 10, "fa_idx": 0}
    sid, new = helper.get_sps_id(a)
    assert (sid, new) == (0, True)
    sid, new = helper.get_sps_id(dict(a))
    assert (sid, new) == (0, False)
    sid, new = helper.get_sps_id({**a, "qp": 11})
    assert (sid, new) == (1, True)


def test_rt_nal_sps_ip(tmp_path):
    ref = _load_ref("DCVC-RT")
    sps = {"sps_id": 3, "height": 1080, "width": 1920,
           "use_ada_i": 1, "ec_part": 1}
    s = _payload(40000, 9)  # > 32767 exercises the 4-byte length
    ours, theirs = tmp_path / "a.bin", tmp_path / "b.bin"
    with open(ours, "wb") as f:
        lc.rt_write_sps(f, sps)
        lc.rt_write_ip(f, True, 3, 21, s)
        lc.rt_write_ip(f, False, 3, 29, _payload(120, 10))
    with open(theirs, "wb") as f:
        ref.write_sps(f, sps)
        ref.write_ip(f, True, 3, 21, s)
        ref.write_ip(f, False, 3, 29, _payload(120, 10))
    assert ours.read_bytes() == theirs.read_bytes()

    with open(theirs, "rb") as f:
        h = lc.rt_read_header(f)
        assert h["nal_type"] == lc.RT_NAL_SPS
        assert lc.rt_read_sps_remaining(f, h["sps_id"]) == sps
        h = lc.rt_read_header(f)
        assert h["nal_type"] == lc.RT_NAL_I and h["sps_id"] == 3
        assert lc.rt_read_ip_remaining(f) == (21, s)
        h = lc.rt_read_header(f)
        assert h["nal_type"] == lc.RT_NAL_P
        assert lc.rt_read_ip_remaining(f) == (29, _payload(120, 10))


def test_rt_sps_helper_dedupe():
    helper = lc.RTSPSHelper()
    a = {"height": 720, "width": 1280, "use_ada_i": 0, "ec_part": 1}
    assert helper.get_sps_id(a) == (0, True)
    assert helper.get_sps_id(dict(a)) == (0, False)
    assert helper.get_sps_id({**a, "ec_part": 0}) == (1, True)
