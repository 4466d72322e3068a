"""Stream-portability conformance harness (scripts/
cross_platform_conformance.py) — deterministic CPU->CPU leg.

The real TPU<->CPU run needs both backends (driven out-of-band; results
committed as artifacts/CROSS_PLATFORM_r05.json: video + 2/3 image QPs
decode bit-identically across platforms, one QP flips a scale-index
decision — the measured DCVC-RT-integerization gap).  This test pins the
harness itself: same-platform encode->decode must report every symbol
sequence identical and every reconstruction bit-exact."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "cross_platform_conformance.py")


def test_harness_cpu_to_cpu_identical(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    d = str(tmp_path / "xplat")
    r = subprocess.run([sys.executable, SCRIPT, "encode", "--platform",
                        "cpu", "--dir", d], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stdout + r.stderr
    rep = str(tmp_path / "rep.json")
    r = subprocess.run([sys.executable, SCRIPT, "decode", "--platform",
                        "cpu", "--src", "cpu", "--dir", d,
                        "--report", rep], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.load(open(rep))
    assert all(e["symbols_identical"] and e["recon_bitexact"]
               for e in report["image"])
    assert all(e["recon_bitexact"] for e in report["video"])
