"""Legacy-family eval CLI: DCVC / DCVC-TCM / DCVC-HEM / DCVC-DC /
DCVC-FM end-to-end over real per-frame `.bin` containers.

The per-family counterpart of the reference drivers
(DCVC-family/DCVC/test_video.py:73-176, DCVC-HEM/DC test_video.py,
DCVC-FM/src/utils/test_helper.py:205-280), sharing the test-config JSON
schema with the top-level harness.  BASELINE configs 2-4 run through
this entry point:

  python test_video_family.py --model dcvc --test_config cfg.json \
      --rate_num 1 --gop 32 --stream_path /tmp/streams \
      --output_path result.json

Legacy models run in the RGB [0, 1] domain; yuv420 sources are converted
with the same BT.709 transforms the reference dataset tool uses
(test_data_to_png.py / DCVC-DC/test_data_to_png.py:8-17).
"""

import argparse
import json
import os
import sys

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the ambient axon sitecustomize pins jax to the TPU tunnel and
    # ignores the env var; jax.config wins (see tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   choices=["dcvc", "tcm", "hem", "dc", "fm", "rt"])
    p.add_argument("--test_config", required=True)
    p.add_argument("--rate_num", type=int, default=1)
    p.add_argument("--gop", type=int, default=32,
                   help="intra period; -1 = single intra frame")
    p.add_argument("--frame_num", type=int, default=-1,
                   help="cap frames per sequence (-1 = config value)")
    p.add_argument("--stream_path", default="out_bin_family")
    p.add_argument("--output_path", default="family_result.json")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model configs (smoke/CI)")
    p.add_argument("--fast", action="store_true",
                   help="estimated-bits mode without entropy coding "
                        "(fm/dcvc/tcm/hem; reference test_helper.py:134, "
                        "DCVC/test_video.py:156-175)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_path_i", default=None,
                   help="native I-codec checkpoint (trained ckpt.bin or "
                        "scripts/import_checkpoint.py output)")
    p.add_argument("--model_path_p", default=None,
                   help="native P-codec checkpoint")
    return p.parse_args()


def read_sequence_rgb(seq_dir_or_file, src_type, width, height, n):
    """Returns list of (3, h, w) uint8 RGB frames."""
    import numpy as np
    from dcvc_tpu.utils.video_io import PNGReader, YUV420Reader
    frames = []
    if src_type == "png":
        reader = PNGReader(seq_dir_or_file)
        for _ in range(n):
            f = reader.read_one_frame()
            if f is None:
                break
            frames.append(f)
    else:
        import jax.numpy as jnp
        from dcvc_tpu.core.color import ycbcr420_to_444_np, ycbcr2rgb
        reader = YUV420Reader(seq_dir_or_file, width, height)
        for _ in range(n):
            y, uv = reader.read_one_frame()
            if y is None:
                break
            yuv444 = ycbcr420_to_444_np(y.astype(np.float32),
                                        uv.astype(np.float32))
            rgb = np.asarray(ycbcr2rgb(
                jnp.asarray(yuv444.transpose(1, 2, 0) / 255.0)))
            frames.append(np.clip(np.round(rgb * 255), 0, 255)
                          .transpose(2, 0, 1).astype(np.uint8))
    return frames


def main():
    args = parse_args()
    from dcvc_tpu.eval.family import FamilyRunner

    with open(args.test_config) as f:
        cfg = json.load(f)
    root = cfg.get("root_path", "")
    runner = FamilyRunner(args.model, args.stream_path,
                          rate_num=args.rate_num, tiny=args.tiny,
                          seed=args.seed,
                          model_path_i=args.model_path_i,
                          model_path_p=args.model_path_p)

    results = {}
    for cls_name, cls in cfg["test_classes"].items():
        if not cls.get("test", 0):
            continue
        results[cls_name] = {}
        for seq_name, seq in cls["sequences"].items():
            path = os.path.join(root, cls["base_path"], seq_name)
            n = seq["frames"] if args.frame_num < 0 \
                else min(args.frame_num, seq["frames"])
            frames = read_sequence_rgb(path, cls["src_type"],
                                       seq["width"], seq["height"], n)
            if not frames:
                print(f"! no frames for {seq_name}", file=sys.stderr)
                continue
            gop = args.gop
            ip = seq.get("intra_period", gop)
            if ip == -1:
                gop = len(frames) + 1   # single intra
            if args.fast:
                runner._h, runner._w = frames[0].shape[1:]
                res = {f"rate_{r}": runner.run_sequence_fast(
                    frames, r, gop, seq_name=f"{cls_name}_{seq_name}_r{r}")
                    for r in range(args.rate_num)}
            else:
                res = runner.run(frames, list(range(args.rate_num)), gop,
                                 seq_name=f"{cls_name}_{seq_name}")
            results[cls_name][seq_name] = res
            for rk, rv in res.items():
                flag = "" if rv["bitexact"] else "  !! MISMATCH"
                print(f"{cls_name}/{seq_name} {rk}: bpp {rv['avg_bpp']:.4f} "
                      f"psnr {rv['avg_psnr']:.2f} "
                      f"(i {rv['avg_psnr_i']:.2f} p {rv['avg_psnr_p']:.2f})"
                      f"{flag}", flush=True)

    with open(args.output_path, "w") as f:
        json.dump({"model": args.model, "results": results}, f, indent=1)
    print(f"results -> {args.output_path}")
    bad = [1 for c in results.values() for s in c.values()
           for r in s.values() if not r["bitexact"]]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
