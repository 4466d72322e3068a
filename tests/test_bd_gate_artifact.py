"""Gate on the committed BD-rate artifact (artifacts/BD_RATE_GATE.json).

The artifact is produced by run_bd_gate.py (the counterpart of running
the reference's compare_bd_rate.py against its vendored VTM-17.0 anchor,
/root/reference/compare_bd_rate.py:299).  This test enforces the RD
contract the reference's methodology implies:

- the committed artifact must come from TRAINED checkpoints (not the
  random-weight pipeline-validation run),
- the 4-point RD curve must be rate/quality monotone (more bits buys
  more PSNR),
- rate points must actually be spread across QPs (a collapsed curve --
  every QP coding the same bits -- is the failure mode the structural
  log-ladder init in models/common.py:q_ladder_init exists to prevent),
- the vs-VTM BD-rate numbers must be finite when present.
"""

import json
import math
import os

import pytest

ART = os.path.join(os.path.dirname(__file__), "..",
                   "artifacts", "BD_RATE_GATE.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ART):
        pytest.skip("no BD_RATE_GATE.json committed")
    with open(ART) as f:
        return json.load(f)


def test_trained_weights(artifact):
    assert artifact["trained_weights"], (
        "committed gate artifact is the random-weight pipeline check; "
        "re-run run_bd_gate.py --model_path_i/_p with trained ckpts")


def test_rd_monotone(artifact):
    assert artifact["rd_monotone"]
    pts = sorted(artifact["rd_points"].values(), key=lambda p: p["bpp"])
    assert len(pts) >= 4
    for lo, hi in zip(pts, pts[1:]):
        assert lo["psnr"] <= hi["psnr"] + 1e-9


def test_rate_points_spread(artifact):
    pts = sorted(artifact["rd_points"].values(), key=lambda p: p["bpp"])
    # highest rate point must spend meaningfully more bits than lowest
    assert pts[-1]["bpp"] > 1.5 * pts[0]["bpp"], (
        f"RD curve collapsed: bpp range {pts[0]['bpp']}..{pts[-1]['bpp']}")
    # and the quality span must be non-trivial (quant ladder is live)
    assert pts[-1]["psnr"] - pts[0]["psnr"] > 0.25


def test_bd_numbers_finite(artifact):
    def walk(node):
        if isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif isinstance(node, (int, float)):
            assert math.isfinite(node), "NaN/inf BD-rate in artifact"
    if not artifact.get("extrapolated", False):
        walk(artifact["bd_rate_pct_vs_vtm17"])
