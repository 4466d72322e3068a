"""Checkpoint save/load.

Native format: msgpack of the flax param pytree (flax.serialization) with
a small JSON header carrying the config.  Also provides the keep-last-2
training status files (reference save_status/load_existing_weights,
src/utils/common.py:208-261).
"""

import dataclasses
import json
import os

import flax.serialization
import jax
import numpy as np


def save_params(path, params, cfg=None, extra=None):
    payload = flax.serialization.msgpack_serialize(
        jax.tree.map(np.asarray, params))
    header = {"format": "dcvc_tpu.params.v1"}
    if cfg is not None:
        header["config"] = (cfg if isinstance(cfg, dict)
                            else dataclasses.asdict(cfg))
    if extra:
        header.update(extra)
    header_bytes = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(len(header_bytes).to_bytes(8, "little"))
        f.write(header_bytes)
        f.write(payload)


def load_header(path):
    """Read only the JSON header (config etc.) without the params."""
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        return json.loads(f.read(n).decode())


def load_params(path):
    """Returns (params pytree, header dict)."""
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n).decode())
        params = flax.serialization.msgpack_restore(f.read())
    return params, header


def save_status(save_dir, params, opt_state, epoch, cfg=None):
    """Per-epoch resumable status; prunes older status files."""
    os.makedirs(save_dir, exist_ok=True)
    curr = os.path.join(save_dir, f"status_epo{epoch}.bin")
    status = {
        "epoch": np.asarray(epoch),
        "params": jax.tree.map(np.asarray, params),
        "opt_state": flax.serialization.to_state_dict(opt_state),
    }
    if cfg is not None:
        # carried so a cut-short run still yields a consumable ckpt
        # (scripts/status_to_ckpt.py)
        status["config"] = (cfg if isinstance(cfg, dict)
                            else dataclasses.asdict(cfg))
    payload = flax.serialization.msgpack_serialize(status)
    with open(curr, "wb") as f:
        f.write(payload)
    for fn in os.listdir(save_dir):
        full = os.path.join(save_dir, fn)
        if "status_epo" in fn and full != curr:
            os.remove(full)


def load_latest_status(save_dir):
    """Tries the newest two status files, tolerating a corrupt newest
    (reference load_existing_weights semantics).  Returns dict or None."""
    if not os.path.isdir(save_dir):
        return None
    files = [os.path.join(save_dir, f) for f in os.listdir(save_dir)
             if "status_epo" in f]
    files.sort(key=os.path.getmtime)
    for path in reversed(files[-2:]):
        try:
            with open(path, "rb") as f:
                return flax.serialization.msgpack_restore(f.read())
        except Exception:
            continue
    return None
