"""Convert the newest resumable status checkpoint in a save_dir into a
final ckpt.bin (params + config), so a training run cut short still
yields a consumable checkpoint for the eval CLIs / run_bd_gate.py.

Usage: python scripts/status_to_ckpt.py /path/to/save_dir [out.bin]
           [--config dmci_small|hts_small|...]

--config names a known model config for statuses written before the
config was carried in the status payload.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KNOWN = {
    "dmci_small": ("dcvc_tpu.models.dmci", "SMALL_CONFIG"),
    "dmci_tiny": ("dcvc_tpu.models.dmci", "TINY_CONFIG"),
    "hts_small": ("dcvc_tpu.models.dmc_ht", "SMALL_HT_CONFIG"),
    "hts_tiny": ("dcvc_tpu.models.dmc_ht", "TINY_HT_CONFIG"),
}


def main():
    import importlib
    args = sys.argv[1:]
    cfg = None
    if "--config" in args:
        i = args.index("--config")
        mod, name = KNOWN[args[i + 1]]
        cfg = getattr(importlib.import_module(mod), name)
        del args[i:i + 2]
    save_dir = args[0]
    out = args[1] if len(args) > 1 else os.path.join(save_dir, "ckpt.bin")
    from dcvc_tpu.utils.checkpoint import load_latest_status, save_params
    status = load_latest_status(save_dir)
    if status is None:
        print(f"no status checkpoints under {save_dir}", file=sys.stderr)
        return 1
    save_params(out, status["params"], cfg or status.get("config"))
    print(f"epoch {status['epoch']} params -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
