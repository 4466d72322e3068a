"""Convert a reference torch checkpoint into the native format.

Usage:
    python scripts/import_checkpoint.py cvpr2026_image.pth.tar out.bin
    python scripts/import_checkpoint.py ckpt.pth.tar out.bin --kind fm

The output is consumable by the eval CLIs (test_video.py
--model_path_i/_p, test_video_family.py --model_path_i/_p,
test_image.py).  Key maps: dcvc_tpu/utils/torch_import.py (forward
parity tested per family in tests/test_legacy_import.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    from dcvc_tpu.utils.import_cli import all_kinds, import_checkpoint
    ap = argparse.ArgumentParser()
    ap.add_argument("pth_path")
    ap.add_argument("out_path")
    ap.add_argument("--kind", default="auto",
                    choices=["auto"] + all_kinds())
    ap.add_argument("--lenient", action="store_true",
                    help="tolerate unmapped reference keys")
    args = ap.parse_args()
    unused = import_checkpoint(args.pth_path, args.out_path,
                               kind=args.kind, strict=not args.lenient)
    if unused:
        print(f"! {len(unused)} unmapped keys: {unused[:8]}",
              file=sys.stderr)
    print(f"wrote {args.out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
