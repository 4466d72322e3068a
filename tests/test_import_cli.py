"""End-to-end checkpoint plumbing: native save -> FamilyRunner load,
and reference .pth.tar -> scripts/import_checkpoint.py -> native.

Complements tests/test_legacy_import.py (key-map forward parity): here
the subject is the user-facing path itself — the converter CLI and the
--model_path_i/_p flags of test_video_family.py (counterpart of the
reference simply torch.load()-ing a released checkpoint,
/root/reference/test_video.py:427-455).
"""

import os

import jax
import numpy as np
import pytest

# tiny-codec jit inits dominate; same budget class as test_family_eval
pytestmark = pytest.mark.slow


def _tree_equal(a, b):
    eq = jax.tree.map(lambda x, y: bool(np.array_equal(np.asarray(x),
                                                       np.asarray(y))),
                      a, b)
    return all(jax.tree.leaves(eq))


def test_family_runner_loads_native_ckpt(tmp_path):
    """Round-trip: save a runner's random P-codec params, reload them
    into a fresh runner via model_path_p, assert identical trees and a
    working bit-exact encode/decode."""
    from dcvc_tpu.eval.family import FamilyRunner
    from dcvc_tpu.utils.checkpoint import save_params

    src = FamilyRunner("fm", str(tmp_path / "s1"), tiny=True, seed=3)
    p_path = str(tmp_path / "p.bin")
    i_path = str(tmp_path / "i.bin")
    save_params(p_path, src.p_codec.params, src.p_codec.cfg)
    save_params(i_path, {"params": src.i_codec.params,
                         "eb_params": src.i_codec.eb_params}
                if hasattr(src.i_codec, "eb_params")
                else src.i_codec.params, src.i_codec.cfg)

    dst = FamilyRunner("fm", str(tmp_path / "s2"), tiny=True, seed=9,
                       model_path_i=i_path, model_path_p=p_path)
    assert _tree_equal(src.p_codec.params, dst.p_codec.params)
    assert _tree_equal(src.i_codec.params, dst.i_codec.params)

    # the loaded runner encodes/decodes (same smoke shape as
    # tests/test_family_eval.py)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (3, 64, 64), dtype=np.uint8)
              for _ in range(3)]
    res = dst.run(frames, [0], gop=4, seq_name="import_smoke")
    assert res["rate_0"]["frame_bpp"][0] > 0


def test_family_runner_tiny_mismatch_uses_header_cfg(tmp_path):
    """A checkpoint carrying its config must load even when the runner
    was built with different (tiny) defaults."""
    from dcvc_tpu.eval.family import FamilyRunner, _with_params
    from dcvc_tpu.legacy.dcvc_hem import DMCHEMConfig, TINY_HEM_CONFIG
    from dcvc_tpu.runtime.hem_codec import DMCHEMCodec
    from dcvc_tpu.utils.checkpoint import save_params

    other_cfg = DMCHEMConfig(ch_mv=16, ch_n=16, ch_m=16)
    src = DMCHEMCodec.init_random(jax.random.PRNGKey(1), cfg=other_cfg,
                                  init_scale=0.4)
    path = str(tmp_path / "hem.bin")
    save_params(path, src.params, other_cfg)

    tiny = DMCHEMCodec.init_random(jax.random.PRNGKey(2),
                                   cfg=TINY_HEM_CONFIG, init_scale=0.4)
    loaded = _with_params(tiny, path)
    assert loaded.cfg == other_cfg
    assert _tree_equal(loaded.params, src.params)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir("/root/reference/DCVC-family"),
                    reason="reference repo not mounted")
def test_import_checkpoint_cli_evc(tmp_path):
    """reference EVC_LL torch checkpoint -> converter -> native header
    carries family + config and every reference key maps."""
    import sys
    import types
    import torch

    ref_dir = "/root/reference/DCVC-family/EVC"
    for mod in list(sys.modules):
        if mod == "src" or mod.startswith("src."):
            del sys.modules[mod]
    sys.path.insert(0, ref_dir)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.ToPILImage = object
        tv.transforms.ToTensor = object
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    try:
        from src.models.image_model import EVC as RefEVC
        torch.manual_seed(0)
        ref = RefEVC().eval()
        pth = str(tmp_path / "EVC_LL.pth.tar")
        torch.save({"state_dict": ref.state_dict()}, pth)
    finally:
        sys.path.remove(ref_dir)

    from dcvc_tpu.utils.import_cli import guess_kind, import_checkpoint
    from dcvc_tpu.utils.checkpoint import load_header, load_params

    assert guess_kind(pth) == "evc_ll"
    out = str(tmp_path / "evc_ll.bin")
    unused = import_checkpoint(pth, out, kind="auto")
    assert unused == []
    hdr = load_header(out)
    assert hdr["family"] == "evc_ll"
    assert "config" in hdr
    params, _ = load_params(out)
    leaves = jax.tree.leaves(params)
    assert leaves and all(np.isfinite(np.asarray(x)).all()
                          for x in leaves)
