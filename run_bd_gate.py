"""BD-rate gate: exercise the full RD pipeline against the VTM anchor.

Generates a synthetic stand-in for a UVG sequence, encodes/decodes it at
4 rate points through test_video.py, then runs compare_bd_rate.py
against the vendored VTM-17.0 low-delay anchor
(test_cfg/anchors/vtm_17.0_yuv420_LB_allf_ip0.json) and writes the
comparison artifact to artifacts/BD_RATE_GATE.json.

With untrained (random) weights the RD curve sits far below VTM's
quality range, so the vs-anchor number is computed with
--allow_extrapolation and labeled a PIPELINE-VALIDATION number, not a
quality claim; the same command with trained checkpoints produces the
real gate.
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

SEQ = "Beauty_1920x1080_120fps_420_8bit_YUV.yuv"
ANCHOR = "test_cfg/anchors/vtm_17.0_yuv420_LB_allf_ip0.json"


def make_sequence(root, h=192, w=256, n=9):
    """Synthetic stand-in sequence, drawn from the SAME procedural-scene
    distribution as the training corpus (scripts/make_synth_data.py) but
    with a held-out seed: the gate measures trained RD behavior, and the
    tiny smoke models cannot be expected to generalize to unrelated
    content (the reference's gate equivalently evaluates its released
    checkpoints on the distribution they were trained for)."""
    os.makedirs(os.path.join(root, "UVG"), exist_ok=True)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from make_synth_data import scene, shift_frame
    from dcvc_tpu.core.color import rgb2ycbcr_np, yuv_444_to_420_np

    rng = np.random.default_rng(777)      # held out from corpus seeds
    img = scene(rng, h, w)
    dy, dx = rng.uniform(-1.5, 1.5, 2)
    with open(os.path.join(root, "UVG", SEQ), "wb") as f:
        for i in range(n):
            frame = shift_frame(img, dy * i, dx * i)
            yuv = rgb2ycbcr_np(frame.astype(np.float32), quant=False)
            y, uv = yuv_444_to_420_np(yuv.transpose(2, 0, 1))
            f.write(np.clip(y * 255 + 0.5, 0, 255).astype(np.uint8).tobytes())
            f.write(np.clip(uv * 255 + 0.5, 0, 255).astype(np.uint8)
                    .tobytes())
    cfg = {
        "root_path": root,
        "test_classes": {
            "UVG": {
                "test": 1, "base_path": "UVG", "src_type": "yuv420",
                "sequences": {SEQ: {"width": w, "height": h, "frames": n,
                                    "intra_period": -1}},
            }
        },
    }
    cfg_path = os.path.join(root, "bd_gate_config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return cfg_path


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path_i", default="random")
    ap.add_argument("--model_path_p", default="random")
    ap.add_argument("--allow_extrapolation", action="store_true",
                    help="only needed for untrained/random weights whose "
                         "RD range misses the anchor's")
    ap.add_argument("--force_intra", action="store_true",
                    help="image-only gate (every frame intra)")
    ap.add_argument("--frames", type=int, default=65,
                    help="gate sequence length; the VTM anchor averages "
                         "over 600 frames (one intra), so short sequences "
                         "structurally overweight the intra cost")
    args = ap.parse_args()
    trained = args.model_path_i != "random" or args.model_path_p != "random"

    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    os.makedirs("artifacts", exist_ok=True)

    # rate points: spread 4 QPs across the FULL quant ladder of the
    # checkpoint being gated (a narrow low-end slice hides RD behavior)
    qp_num = 8
    if trained:
        from dcvc_tpu.utils.checkpoint import load_header
        path = (args.model_path_i if args.model_path_i != "random"
                else args.model_path_p)
        qp_num = load_header(path).get("config", {}).get("qp_num", qp_num)
    qps = [str(int(round(q))) for q in np.linspace(0, qp_num - 1, 4)]

    with tempfile.TemporaryDirectory() as root:
        cfg_path = make_sequence(root, h=256, w=384, n=args.frames)
        result_json = os.path.join(root, "result.json")
        cmd = [sys.executable, "test_video.py",
               "--test_config", cfg_path,
               "--output_path", result_json,
               "--stream_path", os.path.join(root, "bin"),
               "--model_structure", "hts",
               "--rate_num", "4",
               "--qp_i", *qps,
               "--qp_p", *qps,
               "--model_path_i", args.model_path_i,
               "--model_path_p", args.model_path_p]
        if not trained:
            cmd += ["--tiny_model", "1"]
        if args.force_intra:
            cmd += ["--force_intra", "1"]
        subprocess.run(cmd, check=True, env=env)

        cmd = [sys.executable, "compare_bd_rate.py",
               "--base_method", "VTM-17.0",
               "--log_paths", "VTM-17.0", ANCHOR,
               "dcvc_tpu_hts", result_json,
               "--compare_frame_type", "all",
               "--output_path", os.path.join(root, "bd.json")]
        if args.allow_extrapolation:
            cmd.append("--allow_extrapolation")
        subprocess.run(cmd, check=True, env=env)

        with open(os.path.join(root, "bd.json")) as f:
            bd = json.load(f)
        with open(result_json) as f:
            rd = json.load(f)

    points = {rp: {"bpp": v["ave_all_frame_bpp"],
                   "psnr": v["ave_all_frame_psnr"],
                   "i_bpp": v.get("ave_i_frame_bpp"),
                   "p_bpp": v.get("ave_p_frame_bpp"),
                   "i_psnr": v.get("ave_i_frame_psnr"),
                   "p_psnr": v.get("ave_p_frame_psnr")}
              for rp, v in rd["UVG"][SEQ].items()}
    # RD sanity: higher rate must buy higher quality on trained models
    # (the reference's implicit contract); direction-agnostic check
    by_bpp = sorted(points.values(), key=lambda p: p["bpp"])
    monotone = all(a["psnr"] <= b["psnr"]
                   for a, b in zip(by_bpp, by_bpp[1:]))

    if trained:
        what = ("DMCI, every frame intra" if args.force_intra
                else "DMCI+HTS")
        note = (f"trained-checkpoint gate ({what}) trained on the "
                "synthetic corpus (scripts/make_synth_data.py), BD-rate "
                "vs the VTM-17.0 anchor on the synthetic stand-in "
                "sequence; content differs from real UVG so the number "
                "measures the METHODOLOGY end-to-end, not published "
                "quality")
    else:
        note = ("pipeline-validation run: synthetic stand-in sequence, "
                "UNTRAINED tiny models; pass --model_path_i/_p for the "
                "trained gate")
    def nan_to_none(node):
        """Keep the artifact strict JSON (json.dump would emit a literal
        NaN token that non-Python parsers reject)."""
        if isinstance(node, dict):
            return {k: nan_to_none(v) for k, v in node.items()}
        if isinstance(node, float) and not np.isfinite(node):
            return None
        return node

    has_nan = json.dumps(bd, allow_nan=True).find("NaN") >= 0

    artifact = {
        "note": note,
        "trained_weights": trained,
        "force_intra": args.force_intra,
        "rd_monotone": monotone,
        "anchor": ANCHOR,
        "extrapolated": args.allow_extrapolation,
        "bd_rate_pct_vs_vtm17": nan_to_none(bd),
        "rd_points": points,
    }
    with open("artifacts/BD_RATE_GATE.json", "w") as f:
        json.dump(artifact, f, indent=2, allow_nan=False)
    print(json.dumps({k: artifact[k] for k in
                      ("trained_weights", "rd_monotone",
                       "bd_rate_pct_vs_vtm17")}, indent=2))
    print("wrote artifacts/BD_RATE_GATE.json")
    rc = 0
    if trained and not monotone:
        print("!! RD curve not monotone", file=sys.stderr)
        rc = 1
    if trained and has_nan and not args.allow_extrapolation:
        print("!! BD-rate is NaN (RD ranges do not overlap the anchor "
              "and --allow_extrapolation is off) — gate FAILED",
              file=sys.stderr)
        rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
