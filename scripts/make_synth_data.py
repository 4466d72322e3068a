"""Generate a small synthetic training corpus (no external datasets are
reachable in this environment): multi-scale textured scenes with global
+ local motion, written as the ImageFolder / VideoFolder description
formats (dcvc_tpu/data/datasets.py).

Usage: python scripts/make_synth_data.py --root /tmp/synth_data \
           [--images 160] [--seqs 24] [--frames 17] [--size 256]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scene(rng, h, w):
    """Procedural image with structure at several scales: gradients,
    shapes, band-limited texture."""
    from scipy.ndimage import gaussian_filter
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    # smooth background gradient
    for c in range(3):
        a, b, ph = rng.uniform(-1, 1, 3)
        img[:, :, c] = 0.5 + 0.25 * (a * yy / h + b * xx / w + ph)
    # random soft shapes
    for _ in range(rng.integers(4, 10)):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        r = rng.uniform(6, h / 3)
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        color = rng.uniform(0, 1, 3).astype(np.float32)
        alpha = rng.uniform(0.3, 0.9)
        img[mask] = (1 - alpha) * img[mask] + alpha * color
    # band-limited texture at 2 scales
    for sigma, amp in ((2.0, 0.10), (6.0, 0.08)):
        tex = gaussian_filter(rng.normal(0, 1, (h, w)), sigma)
        tex /= max(np.abs(tex).max(), 1e-6)
        img += amp * tex[:, :, None]
    return np.clip(img, 0, 1)


def shift_frame(img, dy, dx):
    """Subpixel global translation (wrap) — cheap coherent motion."""
    from scipy.ndimage import shift
    return np.clip(shift(img, (dy, dx, 0), order=1, mode="wrap"), 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--images", type=int, default=160)
    ap.add_argument("--seqs", type=int, default=24)
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    from PIL import Image

    rng = np.random.default_rng(args.seed)
    s = args.size

    img_root = os.path.join(args.root, "images")
    os.makedirs(img_root, exist_ok=True)
    names = []
    for i in range(args.images):
        img = scene(rng, s, s)
        name = f"im{i:04d}.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(img_root, name))
        names.append(name)
    with open(os.path.join(img_root, "description.json"), "w") as f:
        json.dump(names, f)

    vid_root = os.path.join(args.root, "videos")
    os.makedirs(vid_root, exist_ok=True)
    frame_names = [f"im{i + 1}.png" for i in range(args.frames)]
    seqs = []
    for k in range(args.seqs):
        seq_dir = os.path.join(vid_root, f"seq{k:03d}")
        os.makedirs(seq_dir, exist_ok=True)
        img = scene(rng, s, s)
        vy, vx = rng.uniform(-1.5, 1.5, 2)
        for i, name in enumerate(frame_names):
            frame = shift_frame(img, vy * i, vx * i)
            frame = np.clip(frame + rng.normal(0, 0.004, frame.shape), 0, 1)
            Image.fromarray((frame * 255).astype(np.uint8)).save(
                os.path.join(seq_dir, name))
        seqs.append({"path": f"seq{k:03d}", "height": s, "width": s,
                     "seq_length": args.frames})
    with open(os.path.join(vid_root, "description.json"), "w") as f:
        json.dump({"seqs": seqs, "frames": frame_names}, f)

    print(f"{args.images} images -> {img_root}")
    print(f"{args.seqs} x {args.frames}f sequences -> {vid_root}")


if __name__ == "__main__":
    main()
