"""One-shot conversion: reference torch checkpoints -> native format.

The key maps in torch_import.py are forward-parity tested per family
(tests/test_legacy_import.py, tests/test_torch_import.py); this module
adds the missing end-to-end path from a downloaded reference
``.pth[.tar]`` to a ``ckpt.bin`` the eval CLIs consume directly
(test_video.py --model_path_i/_p, test_video_family.py --model_path_*,
test_image.py).  Counterpart of the reference simply torch.load()-ing
its released checkpoints (e.g. /root/reference/test_video.py:427-455).

Each registry entry builds the family's flax parameter template by
random-initializing the SAME runtime codec the eval CLIs construct, so
imported trees are structurally identical to what the runtimes expect
(including merged branch-dependent params like FM's adaptor_0/adaptor_1).
"""

import functools

import jax
import jax.numpy as jnp

from . import torch_import as ti
from .checkpoint import save_params


def _codec_template(make):
    """Template via a codec's init_random (params + config)."""
    def build():
        codec = make()
        return codec.params, codec.cfg
    return build


def _uf_image():
    from ..runtime.image_codec import DMCICodec
    return DMCICodec.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)


def _uf_video(structure):
    from ..models.dmc_ht import HTS_CONFIG, HTL_CONFIG
    from ..models.dmc_ld import LD_CONFIG
    from ..runtime.video_codec import DMCHTCodec, DMCLDCodec
    if structure == "ld":
        return DMCLDCodec.init_random(jax.random.PRNGKey(0), cfg=LD_CONFIG,
                                      dtype=jnp.float32)
    cfg = HTS_CONFIG if structure == "hts" else HTL_CONFIG
    return DMCHTCodec.init_random(jax.random.PRNGKey(0), cfg=cfg,
                                  dtype=jnp.float32)


def _legacy(codec_mod, codec_cls):
    import importlib
    mod = importlib.import_module(f"..{codec_mod}", __package__)
    cls = getattr(mod, codec_cls)
    return cls.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)


# kind -> (template builder, key_fn, allowed-unused torch key suffixes)
REGISTRY = {
    # DCVC-UF trio + intra
    "dmci": (_codec_template(_uf_image), ti.key_fn_dmci, ()),
    "hts": (_codec_template(lambda: _uf_video("hts")),
            ti.key_fn_dmc_ht, ()),
    "htl": (_codec_template(lambda: _uf_video("htl")),
            functools.partial(ti.key_fn_dmc_ht, hts=False), ()),
    "ld": (_codec_template(lambda: _uf_video("ld")), ti.key_fn_dmc_ld, ()),
    # legacy family video models
    "fm": (_codec_template(lambda: _legacy("runtime.fm_codec",
                                           "DMCFMCodec")),
           ti.key_fn_fm, ()),
    "dc": (_codec_template(lambda: _legacy("runtime.dc_codec",
                                           "DMCDCCodec")),
           ti.key_fn_dc, ()),
    "hem": (_codec_template(lambda: _legacy("runtime.hem_codec",
                                            "DMCHEMCodec")),
            ti.key_fn_hem, ()),
    "tcm": (_codec_template(lambda: _legacy("runtime.tcm_codec",
                                            "DMCTCMCodec")),
            ti.key_fn_tcm, ()),
    # serial masked-conv AR model: .mask buffers are constants, not params
    "dcvc": (_codec_template(lambda: _legacy("runtime.dcvc_codec",
                                             "DCVCCodec")),
             ti.key_fn_dcvc, (".mask",)),
    "rt": (_codec_template(lambda: _legacy("legacy.dcvc_rt",
                                           "DMCRTCodec")),
           ti.key_fn_rt, ()),
}


def _evc_builder(cfg_name):
    def build():
        from ..legacy import evc as evc_mod
        from ..runtime.evc_codec import EVCCodec
        cfg = getattr(evc_mod, cfg_name)
        codec = EVCCodec.init_random(jax.random.PRNGKey(0), cfg=cfg,
                                     dtype=jnp.float32)
        return codec.params, codec.cfg
    return build


for _variant in ("LL", "MM", "SS", "LM", "LS", "ML", "SL", "MS"):
    REGISTRY[f"evc_{_variant.lower()}"] = (
        _evc_builder(f"EVC_{_variant}_CONFIG"), ti.key_fn_evc, ())

# filename hints -> kind (so `--kind auto` works on reference names)
_NAME_HINTS = (
    ("cvpr2026_image", "dmci"), ("cvpr2026_video_hts", "hts"),
    ("cvpr2026_video_htl", "htl"), ("cvpr2026_video_ld", "ld"),
    ("cvpr2024_video", "fm"), ("cvpr2023_video", "dc"),
    ("acmmm2022_video", "hem"), ("cvpr2025_video", "rt"),
    ("EVC_LL", "evc_ll"), ("EVC_LM", "evc_lm"), ("EVC_LS", "evc_ls"),
    ("EVC_ML", "evc_ml"), ("EVC_MM", "evc_mm"), ("EVC_SL", "evc_sl"),
    ("EVC_SS", "evc_ss"), ("EVC_MS", "evc_ms"),
    ("model_dcvc", "dcvc"),
    ("cheng2020-anchor", "cheng2020"), ("bmshj2018-hyperprior",
                                        "hyperprior"),
)


def all_kinds():
    return sorted(REGISTRY) + sorted(_COMPRESSAI)


# CompressAI I-frame codecs (DCVC/TCM baseline): dual-tree payload
# {params, eb_params}; the EntropyBottleneck tensors import separately
# (torch_import.import_entropy_bottleneck).
_COMPRESSAI = {
    "cheng2020": ("Cheng2020Codec", ti.key_fn_cheng2020),
    "hyperprior": ("HyperpriorCodec", ti.key_fn_hyperprior),
}
# buffers with no flax counterpart (coder CDF caches, reparametrizers)
_COMPRESSAI_UNUSED_OK = ("entropy_bottleneck", "gaussian_conditional")


def _import_compressai(kind, state_dict, strict):
    from ..runtime import compressai_codec as cc
    codec = getattr(cc, _COMPRESSAI[kind][0]).init_random(
        jax.random.PRNGKey(0))
    params, unused = ti.import_state_dict(state_dict, codec.params,
                                          key_fn=_COMPRESSAI[kind][1])
    unused = [k for k in unused
              if not any(k.startswith(p) for p in _COMPRESSAI_UNUSED_OK)
              and "reparam" not in k and not k.endswith(".mask")]
    if strict and unused:
        raise ValueError(f"{len(unused)} unmapped keys: {unused[:5]}")
    eb = ti.import_entropy_bottleneck(state_dict)
    return {"params": params, "eb_params": eb}, codec.cfg, unused


def guess_kind(path):
    import os
    name = os.path.basename(path)
    for hint, kind in _NAME_HINTS:
        if hint in name:
            return kind
    raise ValueError(
        f"cannot guess model kind from {name!r}; pass --kind "
        f"(one of {sorted(REGISTRY)})")


def import_checkpoint(pth_path, out_path, kind="auto", strict=True):
    """Convert one reference checkpoint; returns the unused-key list."""
    if kind == "auto":
        kind = guess_kind(pth_path)
    state_dict = ti.load_torch_checkpoint(pth_path)
    if kind in _COMPRESSAI:
        params, cfg, unused = _import_compressai(kind, state_dict, strict)
    else:
        build, key_fn, allowed_unused = REGISTRY[kind]
        template, cfg = build()
        params, unused = ti.import_state_dict(state_dict, template,
                                              key_fn=key_fn)
        unused = [k for k in unused
                  if not any(k.endswith(s) for s in allowed_unused)]
        if strict and unused:
            raise ValueError(f"{len(unused)} unmapped reference keys, "
                             f"e.g. {unused[:5]} — wrong --kind?")
    save_params(out_path, params, cfg, extra={"family": kind,
                                              "source": pth_path})
    return unused
