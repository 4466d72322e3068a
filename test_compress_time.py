"""Speed benchmark wrapper (reference test_compress_time.py): runs
test_video.py with --verbose 2 on the runtime_avg config (HEVC_B 97-frame
1080p), averages per-frame encode/decode times, and reports ms + FPS
(FPS = frame_delay / avg_chunk_time)."""

import argparse
import json
import os
import sys


def parse_args(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_structure", type=str, default="hts",
                        choices=["htl", "hts", "ld"])
    parser.add_argument("--img", action="store_true",
                        help="benchmark the intra codec (force_intra)")
    parser.add_argument("--output_path", type=str, default="runtime_out.json")
    parser.add_argument("--model_path_i", type=str, default="random")
    parser.add_argument("--model_path_p", type=str, default="random")
    parser.add_argument("--test_config", type=str,
                        default="test_cfg/runtime_avg.json")
    parser.add_argument("--force_root_path", type=str, default=None)
    parser.add_argument("--tiny_model", action="store_true")
    return parser.parse_args(argv)


def main(argv):
    args = parse_args(argv)
    dataset = "HEVC_B"

    img_arg = " --force_intra 1" if args.img else " --force_intra 0"
    extra = " --tiny_model 1" if args.tiny_model else ""
    if args.force_root_path:
        extra += f" --force_root_path {args.force_root_path}"
    command_line = (
        f"python test_video.py --verbose 2 --rate_num 4{img_arg}"
        f" --test_config {args.test_config}"
        f" --force_frame_num -1 -w 1"
        f" --skip_thres 0.15"
        f" --output_path {args.output_path}"
        f" --model_path_i {args.model_path_i}"
        f" --model_path_p {args.model_path_p}"
        f" --model_structure {args.model_structure}{extra}")
    print(command_line, flush=True)
    ret = os.system(command_line)
    if ret != 0:
        sys.exit(1)

    with open(args.output_path) as f:
        res = json.load(f)[dataset]
    encoding_time, decoding_time = [], []
    for seq in res:
        for qp in res[seq]:
            encoding_time.append(res[seq][qp]["avg_frame_encoding_time"])
            decoding_time.append(res[seq][qp]["avg_frame_decoding_time"])
    avg_enc = sum(encoding_time) / len(encoding_time)
    avg_dec = sum(decoding_time) / len(decoding_time)

    frame_delay = 1 if args.model_structure == "ld" or args.img else 8
    print(f"Average encoding time on {dataset}"
          f" = {avg_enc * 1000:.4f} ms / {frame_delay / avg_enc:.4f} fps")
    print(f"Average decoding time on {dataset}"
          f" = {avg_dec * 1000:.4f} ms / {frame_delay / avg_dec:.4f} fps")


if __name__ == "__main__":
    main(sys.argv[1:])
