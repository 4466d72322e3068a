"""BD-rate math + comparison tool tests."""

import json
import subprocess
import sys

import numpy as np

from dcvc_tpu.utils.bd_metric import bd_rate, bd_psnr


class TestBDMetric:
    def test_identical_curves_zero(self):
        rate = [0.1, 0.2, 0.4, 0.8]
        psnr = [30, 33, 36, 39]
        assert abs(bd_rate(rate, psnr, rate, psnr)) < 1e-9
        assert abs(bd_psnr(rate, psnr, rate, psnr)) < 1e-9

    def test_halved_rate_is_minus_50(self):
        rate_a = np.array([0.1, 0.2, 0.4, 0.8])
        psnr = [30, 33, 36, 39]
        rate_t = rate_a / 2
        np.testing.assert_allclose(bd_rate(rate_a, psnr, rate_t, psnr),
                                   -50.0, atol=1e-6)

    def test_one_db_gain(self):
        rate = [0.1, 0.2, 0.4, 0.8]
        psnr_a = np.array([30.0, 33, 36, 39])
        np.testing.assert_allclose(
            bd_psnr(rate, psnr_a, rate, psnr_a + 1.0), 1.0, atol=1e-6)

    def test_better_curve_negative_bd_rate(self):
        rate = [0.1, 0.2, 0.4, 0.8]
        psnr_a = [30.0, 33, 36, 39]
        psnr_t = [31.0, 34, 37, 40]
        assert bd_rate(rate, psnr_a, rate, psnr_t) < -5


def _fake_result(bpps, psnrs):
    out = {}
    for i, (b, p) in enumerate(zip(bpps, psnrs)):
        out[f"{i:03d}"] = {
            "i_frame_num": 1, "p_frame_num": 9,
            "ave_i_frame_bpp": b * 3, "ave_i_frame_psnr": p,
            "ave_p_frame_bpp": b * 0.8, "ave_p_frame_psnr": p,
            "ave_all_frame_bpp": b, "ave_all_frame_psnr": p,
        }
    return out


def test_compare_cli(tmp_path):
    anchor = {"ClassX": {"seq1": _fake_result([0.1, 0.2, 0.4, 0.8],
                                              [30, 33, 36, 39])}}
    test = {"ClassX": {"seq1": _fake_result([0.05, 0.1, 0.2, 0.4],
                                            [30, 33, 36, 39])}}
    a_path = tmp_path / "anchor.json"
    t_path = tmp_path / "test.json"
    json.dump(anchor, open(a_path, "w"))
    json.dump(test, open(t_path, "w"))
    out_path = tmp_path / "bd.json"

    proc = subprocess.run(
        [sys.executable, "compare_bd_rate.py",
         "--base_method", "anchor",
         "--log_paths", "anchor", str(a_path), "ours", str(t_path),
         "--output_path", str(out_path)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "BD-rate" in proc.stdout

    with open(out_path) as f:
        res = json.load(f)
    np.testing.assert_allclose(res["psnr"]["all"]["ours"]["ClassX"],
                               -50.0, atol=0.1)
