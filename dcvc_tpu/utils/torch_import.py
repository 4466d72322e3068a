"""Reference-checkpoint import: torch .pth.tar state_dicts -> flax params.

Lets users of the reference (microsoft/DCVC) bring their trained weights:
conv kernels transpose (O, I, kh, kw) -> (kh, kw, I, O) (depthwise
(C, 1, k, k) -> (k, k, 1, C)); module names translate per the mapping
below (reference module tree: src/models/image_model.py,
video_model_ht.py, video_model_ld.py).
"""

import re

import numpy as np


def _torch_key_dmci(path):
    """flax param path (tuple of str, leaf last) -> reference key."""
    segs = list(path)
    leaf = segs.pop()

    out = []
    i = 0
    while i < len(segs):
        s = segs[i]
        nxt = segs[i + 1] if i + 1 < len(segs) else None

        # block-internal renames (DepthConvBlock / SubpelConv2x / RBWS2)
        if s in ("dc_in", "dc_dw", "dc_out", "ffn_in", "ffn_out", "adaptor") \
                and nxt == "conv":
            out.append({"dc_in": "dc.0", "dc_dw": "dc.2", "dc_out": "dc.3",
                        "ffn_in": "ffn.0", "ffn_out": "ffn.2",
                        "adaptor": "adaptor"}[s])
            i += 2
            continue
        if s == "up" and nxt == "conv":        # SubpelConv2x
            out.append("up.conv.0")
            i += 2
            continue
        if s == "down" and nxt == "conv":      # ResidualBlockWithStride2
            out.append("down")
            i += 2
            continue

        # DMCI top-level renames
        if s == "enc_2_down" and nxt == "conv":
            out.append("enc_2.6")
            i += 2
            continue
        m = re.fullmatch(r"enc_2_(\d+)", s)
        if m:
            out.append(f"enc_2.{m.group(1)}")
            i += 1
            continue
        if s == "dec_1_up":
            out.append("dec_1.0")
            i += 1
            continue
        m = re.fullmatch(r"dec_1_(\d+)", s)
        if m:
            out.append(f"dec_1.{int(m.group(1)) + 1}")
            i += 1
            continue
        m = re.fullmatch(r"conv_(\d+)", s)
        if m:
            # Sequential member; a plain Conv1x1 member carries a trailing
            # 'conv' scope to drop
            if nxt == "conv" and i + 2 == len(segs):
                out.append(f"conv.{m.group(1)}")
                i += 2
            else:
                out.append(f"conv.{m.group(1)}")
                i += 1
            continue
        if s == "y_spatial_prior_reduction" and nxt == "conv":
            out.append(s)
            i += 2
            continue
        out.append(s)
        i += 1

    leaf = {"kernel": "weight"}.get(leaf, leaf)
    return ".".join(out + [leaf])


def _convert_leaf(torch_arr, flax_shape):
    arr = np.asarray(torch_arr)
    if arr.ndim == 4:  # conv kernel (O, I, kh, kw) -> (kh, kw, I, O)
        arr = arr.transpose(2, 3, 1, 0)
    assert tuple(arr.shape) == tuple(flax_shape), \
        f"shape mismatch: torch {arr.shape} vs flax {flax_shape}"
    return arr.astype(np.float32)


def import_state_dict(state_dict, flax_params, key_fn=_torch_key_dmci):
    """Fill a flax param pytree from a torch state_dict (tensor or numpy
    values).  Returns (new_params, unused_torch_keys)."""
    import jax

    flat = {}
    used = set()

    def visit(path, leaf):
        segs = tuple(p.key for p in path)
        key = key_fn(segs)
        if key not in state_dict:
            raise KeyError(
                f"reference key '{key}' (for flax path {'/'.join(segs)}) "
                f"not found in state_dict")
        used.add(key)
        return _convert_leaf(state_dict[key], leaf.shape)

    new_params = jax.tree_util.tree_map_with_path(visit, flax_params)
    unused = [k for k in state_dict
              if k not in used and not k.endswith("_cdf")
              and "quantized_cdf" not in k and "cdf_length" not in k]
    return new_params, unused


def load_torch_checkpoint(path):
    """Load a reference .pth.tar into {key: numpy} (get_state_dict
    semantics: unwrap state_dict/net, strip module. prefixes)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if "net" in ckpt:
        ckpt = ckpt["net"]
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out
