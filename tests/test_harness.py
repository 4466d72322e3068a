"""End-to-end harness test: synthetic YUV420 sequence -> CLI -> result JSON
with the reference schema.  Exercises the full public pipeline (readers,
codecs, bitstream container, metrics, log JSON)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("yuvdata")
    seq_dir = root / "TestClass"
    seq_dir.mkdir()
    h, w, n = 64, 96, 10
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    base_y = gaussian_filter(rng.uniform(0, 255, (h, w)), 4.0)
    base_uv = gaussian_filter(rng.uniform(0, 255, (2, h // 2, w // 2)), 2.0)
    with open(seq_dir / f"synth_{w}x{h}_30.yuv", "wb") as f:
        for i in range(n):
            y = np.clip(np.roll(base_y, i, 1) + rng.normal(0, 2, (h, w)),
                        0, 255).astype(np.uint8)
            uv = np.clip(base_uv + rng.normal(0, 2, base_uv.shape),
                         0, 255).astype(np.uint8)
            f.write(y.tobytes())
            f.write(uv.tobytes())

    cfg = {
        "root_path": str(root),
        "test_classes": {
            "TestClass": {
                "test": 1,
                "base_path": "TestClass",
                "src_type": "yuv420",
                "sequences": {
                    f"synth_{w}x{h}_30.yuv": {
                        "width": w, "height": h, "frames": n,
                        "intra_period": -1,
                    }
                }
            }
        }
    }
    cfg_path = root / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return str(root), str(cfg_path), (h, w, n)


@pytest.mark.parametrize("structure", ["hts", "ld"])
def test_cli_end_to_end(synthetic_dataset, tmp_path, structure):
    root, cfg_path, (h, w, n) = synthetic_dataset
    out_json = tmp_path / f"result_{structure}.json"
    stream_dir = tmp_path / f"bin_{structure}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pp + [os.getcwd()])

    cmd = [sys.executable, "test_video.py",
           "--test_config", cfg_path,
           "--output_path", str(out_json),
           "--stream_path", str(stream_dir),
           "--model_structure", structure,
           "--rate_num", "2",
           "--qp_i", "1", "5",
           "--qp_p", "1", "5",
           "--tiny_model", "1",
           "--verbose", "1"]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=1800)
    assert proc.returncode == 0, proc.stderr[-3000:]

    with open(out_json) as f:
        result = json.load(f)
    seq_results = result["TestClass"][f"synth_{w}x{h}_30.yuv"]
    assert set(seq_results.keys()) == {"000", "001"}
    for rate in seq_results.values():
        assert rate["i_frame_num"] == 1
        assert rate["p_frame_num"] == n - 1
        assert rate["ave_all_frame_bpp"] > 0
        assert 0 < rate["ave_all_frame_psnr"] <= 99.9
        assert "ave_all_frame_psnr_y" in rate  # YUV metrics present
        assert rate["test_time"] > 0

    # bitstreams exist and are non-trivial
    bins = list((stream_dir / "TestClass").glob("*.bin"))
    assert len(bins) == 2
    assert all(b.stat().st_size > 100 for b in bins)


def test_cli_worker_pool_identical(synthetic_dataset, tmp_path):
    """--worker N > 1 runs points in a process pool (reference
    test_video.py:496-500) and must produce the identical result JSON."""
    root, cfg_path, (h, w, n) = synthetic_dataset
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pp + [os.getcwd()])

    outs = {}
    for workers in (1, 2):
        out_json = tmp_path / f"result_w{workers}.json"
        cmd = [sys.executable, "test_video.py",
               "--test_config", cfg_path,
               "--output_path", str(out_json),
               "--stream_path", str(tmp_path / f"bin_w{workers}"),
               "--model_structure", "ld",
               "--rate_num", "2",
               "--qp_i", "1", "5",
               "--qp_p", "1", "5",
               "--force_frame_num", "3",
               "--tiny_model", "1",
               "--worker", str(workers)]
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                              timeout=1800)
        assert proc.returncode == 0, proc.stderr[-3000:]
        with open(out_json) as f:
            outs[workers] = json.load(f)

    a = outs[1]["TestClass"]
    b = outs[2]["TestClass"]
    for seq in a:
        for rate in a[seq]:
            for key in ("ave_all_frame_bpp", "ave_all_frame_psnr",
                        "i_frame_num", "p_frame_num"):
                assert a[seq][rate][key] == b[seq][rate][key], (seq, rate,
                                                                key)
