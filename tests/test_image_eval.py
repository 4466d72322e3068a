"""Image eval CLI smoke: every supported i_frame_model codes a tiny PNG
set through a real bitstream file and must be encoder/decoder bit-exact
(reference counterpart: EVC/test_image.py; BASELINE config 1 path).
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
def image_dir(tmp_path_factory):
    from PIL import Image
    from scipy.ndimage import gaussian_filter
    d = tmp_path_factory.mktemp("kodak_tiny")
    rng = np.random.default_rng(0)
    for i in range(2):
        img = np.clip(gaussian_filter(
            rng.uniform(0, 255, (64, 96, 3)), 3.0), 0, 255)
        Image.fromarray(img.astype(np.uint8)).save(d / f"kodim{i:02d}.png")
    return d


@pytest.mark.parametrize("model", ["dmci", "evc", "intra_noar",
                                   "cheng2020", "bmshj2018"])
def test_image_cli(model, image_dir, tmp_path):
    out = tmp_path / f"{model}.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "test_image.py"),
         "--i_frame_model", model, "--image_path", str(image_dir),
         "--tiny", "--qp", "5", "--q_scale", "1.1",
         "--stream_path", str(tmp_path / "bin"),
         "--output_path", str(out)],
        capture_output=True, text=True, cwd=REPO, timeout=1500)
    assert r.returncode == 0, r.stdout + r.stderr
    data = json.loads(out.read_text())
    assert data["summary"]["images"] == 2
    for name, rec in data["per_image"].items():
        assert rec["bitexact"], name
        assert rec["bpp"] > 0
