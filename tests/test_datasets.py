"""Dataset/loader unit tests: threaded BatchLoader with the in-memory
frame cache must produce complete, well-formed batches (the trainers'
host-side input path)."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("vids")
    rng = np.random.default_rng(0)
    seqs = []
    frames = [f"im{i + 1}.png" for i in range(9)]
    for k in range(6):
        d = root / f"seq{k}"
        d.mkdir()
        for name in frames:
            img = rng.integers(0, 255, (80, 96, 3), np.uint8)
            Image.fromarray(img).save(d / name)
        seqs.append({"path": f"seq{k}", "height": 80, "width": 96,
                     "seq_length": 9})
    (root / "description.json").write_text(
        json.dumps({"seqs": seqs, "frames": frames}))
    return root


@pytest.mark.parametrize("workers,cache", [(1, False), (4, True)])
def test_batch_loader_video(video_root, workers, cache):
    from dcvc_tpu.data import VideoFolder, BatchLoader
    lambdas = np.linspace(1, 768, 8).astype(np.float32)
    ds = VideoFolder(str(video_root), 64, 64, 8, lambdas, frame_num=9,
                     group_of_pictures=4, raw_rgb=True, cache=cache)
    loader = BatchLoader(ds, 2, seed=0, repeats=3, workers=workers)
    batches = list(loader)
    assert len(batches) == len(loader) == 9
    b = batches[0]
    assert b["frames"][0].shape == (2, 64, 64, 3)       # intra
    assert b["frames"][1].shape == (2, 64, 64, 12)      # gop chunk
    assert len(b["frames"]) == 1 + 2
    assert b["frames"][1].dtype == np.uint8
    assert all(0 <= q < 8 for q in b["qp"])
    if cache:
        # every frame of every sequence decoded at most once
        assert len(ds._cache) <= 6 * 9
        # a second pass is served from the cache (same shapes, no error)
        again = list(BatchLoader(ds, 2, seed=1, repeats=1,
                                 workers=workers))
        assert len(again) == 3


def test_batch_loader_early_break(video_root):
    """Consumer breaking early must not wedge or error the producer."""
    from dcvc_tpu.data import VideoFolder, BatchLoader
    lambdas = np.linspace(1, 768, 8).astype(np.float32)
    ds = VideoFolder(str(video_root), 64, 64, 8, lambdas, frame_num=5,
                     group_of_pictures=4, raw_rgb=True, cache=True)
    loader = BatchLoader(ds, 2, seed=0, repeats=5, workers=4)
    for i, b in enumerate(loader):
        if i == 1:
            break
    # a fresh iteration still works
    assert len(list(BatchLoader(ds, 2, seed=2, repeats=1, workers=4))) == 3
