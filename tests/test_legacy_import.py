"""Parity tests: import random-initialized reference torch state_dicts
of the legacy family models into our flax models and compare the
deterministic eval forwards.  Validates model topology + key maps
(utils/torch_import.py) for the pre-UF generations.

Skipped when the reference repo is not mounted.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_FAM = "/root/reference/DCVC-family"
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REF_FAM),
                                 reason="reference repo not mounted")]


def _fresh_src(path):
    for mod in list(sys.modules):
        if mod == "src" or mod.startswith("src."):
            del sys.modules[mod]
    while path in sys.path:
        sys.path.remove(path)
    sys.path.insert(0, path)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.ToPILImage = object
        tv.transforms.ToTensor = object
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms


def _frame_pair(h, w, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 3.0)
    ref = np.clip(base, 0, 1).astype(np.float32)
    cur = np.clip(np.roll(base, 2, 1)
                  + rng.normal(0, 0.01, base.shape), 0, 1).astype(np.float32)
    return ref[None], cur[None]


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)


def test_dcvc_forward_parity():
    import torch
    _fresh_src(os.path.join(REF_FAM, "DCVC"))
    from src.models.DCVC_net import DCVC_net
    from dcvc_tpu.legacy.dcvc_net import DCVCNet
    from dcvc_tpu.utils.torch_import import import_state_dict, key_fn_dcvc

    torch.manual_seed(0)
    ref_model = DCVC_net().eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    model = DCVCNet()   # default config matches the torch defaults
    ref, cur = _frame_pair(64, 64)
    variables = jax.jit(lambda r: model.init(r, jnp.asarray(ref),
                                             jnp.asarray(cur)))(
        jax.random.PRNGKey(0))
    params, unused = import_state_dict(sd, variables["params"],
                                       key_fn=key_fn_dcvc)
    unused = [k for k in unused if not k.endswith(".mask")]
    assert unused == [], unused[:8]

    out = model.apply({"params": params}, jnp.asarray(ref),
                      jnp.asarray(cur))

    with torch.no_grad():
        rt = torch.from_numpy(ref.transpose(0, 3, 1, 2))
        ct = torch.from_numpy(cur.transpose(0, 3, 1, 2))
        res = ref_model(rt, ct)

    recon_ref = res["recon_image"].numpy().transpose(0, 2, 3, 1)
    assert _rel(out["recon_image"], recon_ref) < 2e-2
    # rate estimates agree (dominated by the same entropy math)
    bpp_ref = float(res["bpp"])
    assert abs(float(out["bpp"][0]) - bpp_ref) / bpp_ref < 5e-2


def test_tcm_forward_parity():
    import torch
    mod = types.ModuleType("pytorch_msssim")

    class _MSSSIM:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return torch.tensor(0.0)
    mod.MS_SSIM = _MSSSIM
    sys.modules["pytorch_msssim"] = mod
    _fresh_src(os.path.join(REF_FAM, "DCVC-TCM"))
    from src.models.video_net_dmc import DMC as RefDMC
    from dcvc_tpu.legacy.dcvc_tcm import DMCTCM
    from dcvc_tpu.utils.torch_import import import_state_dict, key_fn_tcm

    torch.manual_seed(0)
    ref_model = RefDMC().eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    model = DMCTCM()
    ref, cur = _frame_pair(64, 64)
    rf = jnp.zeros((1, 64, 64, model.cfg.ch_n))
    # init both DPB branches: ref_feature None -> adaptor_I, array ->
    # adaptor_P (reference motion_compensation, video_net_dmc.py:176-179)
    v0 = jax.jit(lambda r: model.init(
        r, jnp.asarray(cur), jnp.asarray(ref), None))(jax.random.PRNGKey(0))
    v1 = jax.jit(lambda r: model.init(
        r, jnp.asarray(cur), jnp.asarray(ref), rf))(jax.random.PRNGKey(0))
    merged = dict(v1["params"])
    for k, val in v0["params"].items():
        merged.setdefault(k, val)
    params, unused = import_state_dict(sd, merged, key_fn=key_fn_tcm)
    assert unused == [], unused[:8]

    out = model.apply({"params": params}, jnp.asarray(cur),
                      jnp.asarray(ref), None)

    with torch.no_grad():
        rt = torch.from_numpy(ref.transpose(0, 3, 1, 2))
        ct = torch.from_numpy(cur.transpose(0, 3, 1, 2))
        res = ref_model.forward_one_frame(ct, rt, None)

    recon_ref = res["recon_image"].numpy().transpose(0, 2, 3, 1)
    assert _rel(out["recon_image"], recon_ref) < 2e-2
    bpp_ref = float(res["bpp"])
    assert abs(float(out["bpp"][0]) - bpp_ref) / bpp_ref < 5e-2


def _stub_msssim():
    import torch
    mod = types.ModuleType("pytorch_msssim")

    class _MSSSIM:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return torch.tensor(0.0)

        def to(self, *a, **k):
            return self
    mod.MS_SSIM = _MSSSIM
    sys.modules["pytorch_msssim"] = mod


def test_hem_forward_parity():
    import torch
    _stub_msssim()
    _fresh_src(os.path.join(REF_FAM, "DCVC-HEM"))
    from src.models.video_model import DMC as RefDMC
    from dcvc_tpu.legacy.dcvc_hem import DMCHEM
    from dcvc_tpu.utils.torch_import import import_state_dict, key_fn_hem

    torch.manual_seed(0)
    ref_model = RefDMC().eval()
    # scale conv weights down so the random-init forward stays bounded
    # (at default init the recon explodes to +-1e4 and the comparison
    # degenerates to clamp saturation); both sides load the SAME sd
    sd_t = ref_model.state_dict()
    for k in sd_t:
        if k.endswith(".weight") and sd_t[k].dim() == 4:
            sd_t[k] = sd_t[k] * 0.4
    ref_model.load_state_dict(sd_t)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    model = DMCHEM()
    ref, cur = _frame_pair(64, 64)
    c = model.cfg

    def dpb_of(feature, y, mv_y):
        return {"ref_frame": jnp.asarray(ref), "ref_feature": feature,
                "ref_y": y, "ref_mv_y": mv_y}

    dpb0 = dpb_of(None, None, None)
    dpb1 = dpb_of(jnp.zeros((1, 64, 64, c.ch_n)),
                  jnp.zeros((1, 4, 4, c.ch_m)),
                  jnp.zeros((1, 4, 4, c.ch_mv)))
    v0 = jax.jit(lambda r: model.init(r, jnp.asarray(cur), dpb0,
                                      1.0, 1.0))(jax.random.PRNGKey(0))
    v1 = jax.jit(lambda r: model.init(r, jnp.asarray(cur), dpb1,
                                      1.0, 1.0))(jax.random.PRNGKey(0))
    merged = dict(v1["params"])
    for k, val in v0["params"].items():
        merged.setdefault(k, val)
    params, unused = import_state_dict(sd, merged, key_fn=key_fn_hem)
    assert unused == [], unused[:8]

    out = model.apply({"params": params}, jnp.asarray(cur), dpb0, 1.0, 1.0)

    with torch.no_grad():
        rt = torch.from_numpy(ref.transpose(0, 3, 1, 2))
        ct = torch.from_numpy(cur.transpose(0, 3, 1, 2))
        res = ref_model.forward_one_frame(
            ct, {"ref_frame": rt, "ref_feature": None, "ref_y": None,
                 "ref_mv_y": None},
            mv_y_q_scale=torch.tensor([[[[1.0]]]]),
            y_q_scale=torch.tensor([[[[1.0]]]]))

    # ours clamps the training recon to [0,1] (the reference clamps only
    # in decompress, video_model.py:362) — compare clamped on both sides
    recon_ref = np.clip(
        res["dpb"]["ref_frame"].numpy().transpose(0, 2, 3, 1), 0, 1)
    assert _rel(out["dpb"]["ref_frame"], recon_ref) < 2e-2
    bpp_ref = float(res["bpp"])
    assert abs(float(out["bpp"][0]) - bpp_ref) / bpp_ref < 5e-2


def test_dc_forward_parity():
    import torch
    _stub_msssim()
    _fresh_src(os.path.join(REF_FAM, "DCVC-DC"))
    from src.models.video_model import DMC as RefDMC
    from dcvc_tpu.legacy.dcvc_dc import DMCDC
    from dcvc_tpu.utils.torch_import import import_state_dict, key_fn_dc

    torch.manual_seed(0)
    ref_model = RefDMC().eval()
    sd_t = ref_model.state_dict()
    for k in sd_t:
        if k.endswith(".weight") and sd_t[k].dim() == 4:
            sd_t[k] = sd_t[k] * 0.4
    ref_model.load_state_dict(sd_t)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    model = DMCDC()
    ref, cur = _frame_pair(64, 64)
    c = model.cfg

    def dpb_of(none):
        if none:
            return {"ref_frame": jnp.asarray(ref), "ref_feature": None,
                    "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
        return {"ref_frame": jnp.asarray(ref),
                "ref_feature": jnp.zeros((1, 64, 64, c.ch_1x)),
                "ref_mv_feature": jnp.zeros((1, 16, 16, c.ch_mv)),
                "ref_y": jnp.zeros((1, 4, 4, c.ch_16x)),
                "ref_mv_y": jnp.zeros((1, 4, 4, c.ch_mv))}

    def deep_merge(a, b):
        out = dict(a)
        for k, v in b.items():
            if k in out and hasattr(v, "items"):
                out[k] = deep_merge(out[k], v)
            else:
                out.setdefault(k, v)
        return out

    merged = {}
    for none, fa in ((True, 0), (False, 0), (False, 1), (False, 3)):
        v = jax.jit(lambda r: model.init(
            {"params": r}, jnp.asarray(cur), dpb_of(none), 0, fa,
            jax.random.PRNGKey(1)))(jax.random.PRNGKey(0))
        merged = deep_merge(merged, v["params"])
    params, unused = import_state_dict(sd, merged, key_fn=key_fn_dc)
    assert unused == [], unused[:8]

    out = model.apply({"params": params}, jnp.asarray(cur), dpb_of(True),
                      0, 0)

    with torch.no_grad():
        rt = torch.from_numpy(ref.transpose(0, 3, 1, 2))
        ct = torch.from_numpy(cur.transpose(0, 3, 1, 2))
        res = ref_model.forward_one_frame(
            ct, {"ref_frame": rt, "ref_feature": None,
                 "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None},
            q_in_ckpt=True, q_index=0, frame_idx=0)

    recon_ref = np.clip(
        res["dpb"]["ref_frame"].numpy().transpose(0, 2, 3, 1), 0, 1)
    assert _rel(out["dpb"]["ref_frame"], recon_ref) < 2e-2
    bpp_ref = float(res["bpp"])
    assert abs(float(out["bpp"][0]) - bpp_ref) / bpp_ref < 5e-2


def test_rt_forward_parity():
    """DCVC-RT has no torch training forward (inference-only model);
    compare each stage of the deterministic compress pipeline
    (DCVC-RT/src/models/video_model.py:299-340) component-wise."""
    import torch
    _fresh_src(os.path.join(REF_FAM, "DCVC-RT"))
    from src.models.video_model import DMC as RefDMC
    from dcvc_tpu.legacy.dcvc_rt import DMCRT
    from dcvc_tpu.core.shuffle import pixel_unshuffle
    from dcvc_tpu.utils.torch_import import import_state_dict, key_fn_rt

    torch.manual_seed(0)
    ref_model = RefDMC().eval().float()
    sd_t = ref_model.state_dict()
    for k in sd_t:
        if k.endswith(".weight") and sd_t[k].dim() == 4:
            sd_t[k] = sd_t[k] * 0.4
    ref_model.load_state_dict(sd_t)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    model = DMCRT()
    c = model.cfg
    ref, cur = _frame_pair(64, 64)
    ref_unsh = pixel_unshuffle(jnp.asarray(ref), 8)
    v = jax.jit(lambda r: model.init(r, jnp.asarray(cur), ref_unsh, None,
                                     jnp.int32(0), jax.random.PRNGKey(1)))(
        jax.random.PRNGKey(0))
    # second init covers the P-frame adaptor branch (memory set)
    rfp = jnp.zeros((1, 8, 8, c.ch_d))
    v2 = jax.jit(lambda r: model.init(r, jnp.asarray(cur), rfp, rfp,
                                      jnp.int32(0), jax.random.PRNGKey(1)))(
        jax.random.PRNGKey(0))

    def deep_merge(a, b):
        out = dict(a)
        for k, val in b.items():
            if k in out and hasattr(val, "items"):
                out[k] = deep_merge(out[k], val)
            else:
                out.setdefault(k, val)
        return out

    merged = deep_merge(dict(v["params"]), v2["params"])
    params, unused = import_state_dict(sd, merged, key_fn=key_fn_rt)
    assert unused == [], unused[:8]

    vars_ = {"params": params}
    qp = 0

    def t2j(t):
        return t.detach().numpy().transpose(0, 2, 3, 1)

    with torch.no_grad():
        ct = torch.from_numpy(cur.transpose(0, 3, 1, 2))
        rt = torch.from_numpy(ref.transpose(0, 3, 1, 2))
        feat_t = ref_model.feature_adaptor_i(
            torch.nn.functional.pixel_unshuffle(rt, 8))
        qf = ref_model.q_feature[qp:qp + 1]
        ctx_t_, ctxt_t_ = ref_model.feature_extractor(feat_t, qf)
        y_t = ref_model.encoder(ct, ctx_t_, ref_model.q_encoder[qp:qp + 1])
        z_t = ref_model.hyper_encoder(y_t)
        z_hat_t = torch.round(z_t)
        params_t = ref_model.res_prior_param_decoder(z_hat_t, ctxt_t_)
        y_hat_t = torch.round(y_t)
        feature_t = ref_model.decoder(y_hat_t, ctx_t_,
                                      ref_model.q_decoder[qp:qp + 1])
        recon_t = ref_model.recon_generation_net(
            feature_t, ref_model.q_recon[qp:qp + 1])

    mem, _ = None, None
    feat = model.apply(vars_, ref_unsh,
                       method=lambda m, a: m.feature_adaptor_i(a))
    assert _rel(feat, t2j(feat_t)) < 2e-2
    ctx, ctxt = model.apply(
        vars_, feat, method=lambda m, a: m.feature_extractor(
            a, m._q(m.q_feature, jnp.int32(qp))))
    assert _rel(ctx, t2j(ctx_t_)) < 2e-2
    assert _rel(ctxt, t2j(ctxt_t_)) < 2e-2
    y = model.apply(vars_, jnp.asarray(cur), ctx,
                    method=lambda m, a, b: m.encoder(
                        a.astype(m.dtype), b, m._q(m.q_encoder,
                                                   jnp.int32(qp))))
    assert _rel(y, t2j(y_t)) < 2e-2
    z = model.apply(vars_, y, method=lambda m, a: m.hyper_encoder(a))
    assert _rel(z, t2j(z_t)) < 2e-2

    def fuse(m, zh, ct_):
        hyper = m.hyper_decoder(zh)
        temporal = m.temporal_prior_encoder(ct_)
        return m.y_prior_fusion(
            jnp.concatenate([hyper, temporal], axis=-1))

    pf = model.apply(vars_, jnp.round(z), ctxt, method=fuse)
    assert _rel(pf, t2j(params_t)) < 2e-2

    def recon(m, yh, ct_):
        feature = m.decoder(yh, ct_, m._q(m.q_decoder, jnp.int32(qp)))
        return m.recon_generation_net(feature,
                                      m._q(m.q_recon, jnp.int32(qp)))

    x_hat = model.apply(vars_, jnp.round(y), ctx, method=recon)
    assert _rel(x_hat, np.clip(t2j(recon_t), 0, 1)) < 2e-2


def test_evc_forward_parity():
    import torch
    _fresh_src(os.path.join(REF_FAM, "EVC"))
    from src.models.image_model import EVC_LL
    from dcvc_tpu.legacy.evc import EVC
    from dcvc_tpu.utils.torch_import import import_state_dict, key_fn_evc

    torch.manual_seed(0)
    ref_model = EVC_LL().eval()
    sd_t = ref_model.state_dict()
    for k in sd_t:
        if k.endswith(".weight") and sd_t[k].dim() == 4:
            sd_t[k] = sd_t[k] * 0.4
    ref_model.load_state_dict(sd_t)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    model = EVC()
    ref, cur = _frame_pair(64, 64)
    v = jax.jit(lambda r: model.init({"params": r}, jnp.asarray(cur)))(
        jax.random.PRNGKey(0))
    params, unused = import_state_dict(sd, v["params"], key_fn=key_fn_evc)
    assert unused == [], unused[:8]

    out = model.apply({"params": params}, jnp.asarray(cur), 1.0)

    with torch.no_grad():
        ct = torch.from_numpy(cur.transpose(0, 3, 1, 2))
        res = ref_model(ct, q_scale=torch.tensor([[[[1.0]]]]))

    x_hat_ref = np.clip(res["x_hat"].numpy().transpose(0, 2, 3, 1), 0, 1)
    x_hat = np.clip(np.asarray(out["x_hat"]), 0, 1)
    assert _rel(x_hat, x_hat_ref) < 2e-2
    bpp_ref = float(res["bpp"])
    assert abs(float(out["bpp"][0]) - bpp_ref) / bpp_ref < 5e-2
