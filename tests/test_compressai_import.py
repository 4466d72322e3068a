"""Parity tests for the vendored CompressAI I-frame codecs: import a
random-initialized reference torch model's state_dict and compare the
deterministic dense forward + the entropy banks, validating model
topology, the checkpoint key maps, and the CDF math.

Reference: DCVC-family/DCVC/src/models/{priors,waseda}.py,
src/entropy_models/entropy_models.py.  Skipped when the reference repo
is not mounted.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/DCVC-family/DCVC"
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "src")),
                                 reason="reference repo not mounted")]


def _fresh_src(path):
    for mod in list(sys.modules):
        if mod == "src" or mod.startswith("src."):
            del sys.modules[mod]
    while path in sys.path:
        sys.path.remove(path)
    sys.path.insert(0, path)


def _image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    for c in range(3):
        x[0, :, :, c] = gaussian_filter(x[0, :, :, c], 2.0)
    return np.clip(x, 0, 1)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)


def _filter_unused(unused):
    """Torch state_dicts carry reparametrizer/coder buffers that have no
    flax counterpart (pedestal, lower_bound.bound, CDF caches)."""
    return [k for k in unused
            if not k.startswith("entropy_bottleneck")
            and not k.startswith("gaussian_conditional")
            and "reparam" not in k and not k.endswith(".mask")]


def _patch_ref_pmf():
    """The reference's python CDF builder imports its compiled
    MLCodec_CXX module (ops.cpp:24-84); substitute our
    pmf_to_quantized_cdf — the same ryg_rans port, already byte-
    conformance-proven (tests/test_rans_conformance.py)."""
    import torch
    import src.entropy_models.entropy_models as em
    from dcvc_tpu.entropy.cdf import pmf_to_quantized_cdf as ours
    def patched(pmf, precision=16):
        if hasattr(pmf, "detach"):
            pmf = pmf.detach().numpy()
        return torch.IntTensor(
            np.asarray(ours(np.asarray(pmf, np.float32)), np.int64))
    em.pmf_to_quantized_cdf = patched


def test_hyperprior_forward_parity():
    import torch
    _fresh_src(REF)
    from src.models.priors import ScaleHyperprior as RefSH
    from dcvc_tpu.legacy.compressai_zoo import (HyperpriorConfig,
                                                ScaleHyperprior)
    from dcvc_tpu.utils.torch_import import (import_state_dict,
                                             key_fn_hyperprior)

    torch.manual_seed(0)
    ref = RefSH(N=32, M=48).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = ScaleHyperprior(cfg=HyperpriorConfig(32, 48))
    x = _image(64, 64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, unused = import_state_dict(sd, variables["params"],
                                       key_fn=key_fn_hyperprior)
    unused = _filter_unused(unused)
    assert unused == [], unused

    out = model.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y_ref = ref.g_a(xt)
        z_ref = ref.h_a(torch.abs(y_ref))
        scales_ref = ref.h_s(torch.round(z_ref))
        x_hat_ref = ref.g_s(torch.round(y_ref))

    assert _rel(out["y"], y_ref.numpy().transpose(0, 2, 3, 1)) < 2e-2
    assert _rel(out["scales_hat"],
                scales_ref.numpy().transpose(0, 2, 3, 1)) < 2e-2
    assert _rel(out["x_hat"], x_hat_ref.numpy().transpose(0, 2, 3, 1)) < 2e-2


def test_cheng2020_forward_parity():
    import torch
    _fresh_src(REF)
    from src.models.waseda import Cheng2020Anchor as RefCheng
    from dcvc_tpu.legacy.compressai_zoo import (Cheng2020Anchor,
                                                Cheng2020Config)
    from dcvc_tpu.utils.torch_import import (import_state_dict,
                                             key_fn_cheng2020)

    torch.manual_seed(0)
    ref = RefCheng(N=32).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = Cheng2020Anchor(cfg=Cheng2020Config(32))
    x = _image(64, 64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, unused = import_state_dict(sd, variables["params"],
                                       key_fn=key_fn_cheng2020)
    unused = _filter_unused(unused)
    assert unused == [], unused

    out = model.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        import torch.nn.functional as F
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y_ref = ref.g_a(xt)
        z_ref = ref.h_a(y_ref)
        p_ref = ref.h_s(torch.round(z_ref))
        y_hat_ref = torch.round(y_ref)
        # dense masked context (the reference applies the mask in-place
        # on forward, layers.py:44-47)
        w = ref.context_prediction.weight * ref.context_prediction.mask
        ctx_ref = F.conv2d(y_hat_ref, w, ref.context_prediction.bias,
                           padding=2)
        gp = ref.entropy_parameters(torch.cat([p_ref, ctx_ref], dim=1))
        scales_ref, means_ref = gp.chunk(2, 1)
        x_hat_ref = ref.g_s(y_hat_ref)

    assert _rel(out["y"], y_ref.numpy().transpose(0, 2, 3, 1)) < 2e-2
    assert _rel(out["scales_hat"],
                scales_ref.numpy().transpose(0, 2, 3, 1)) < 2e-2
    assert _rel(out["means_hat"],
                means_ref.numpy().transpose(0, 2, 3, 1)) < 2e-2
    assert _rel(out["x_hat"], x_hat_ref.numpy().transpose(0, 2, 3, 1)) < 2e-2


def test_entropy_bottleneck_bank_parity():
    """eb_bank must reproduce torch EntropyBottleneck.update()'s
    quantized CDFs exactly (entropy_models.py:272-311)."""
    import torch
    _fresh_src(REF)
    from src.entropy_models.entropy_models import EntropyBottleneck
    from dcvc_tpu.entropy.compressai import eb_bank
    from dcvc_tpu.utils.torch_import import import_entropy_bottleneck

    _patch_ref_pmf()
    torch.manual_seed(1)
    eb = EntropyBottleneck(8)
    # perturb so quantiles/medians are non-trivial
    with torch.no_grad():
        eb.quantiles += torch.randn_like(eb.quantiles) * 0.3
    eb.update(force=True)

    sd = {f"entropy_bottleneck.{k}": v.detach().numpy()
          for k, v in eb.state_dict().items()}
    p = import_entropy_bottleneck(sd)
    cdf, lengths, offsets, medians = eb_bank(p)

    ref_cdf = eb._quantized_cdf.numpy()
    ref_len = eb._cdf_length.numpy()
    ref_off = eb._offset.numpy()
    np.testing.assert_array_equal(lengths, ref_len)
    np.testing.assert_array_equal(offsets, ref_off)
    assert cdf.shape[1] >= ref_cdf.shape[1]
    np.testing.assert_array_equal(cdf[:, :ref_cdf.shape[1]], ref_cdf)


def test_gaussian_bank_parity():
    """compressai_gaussian_bank vs torch GaussianConditional.update."""
    import torch
    _fresh_src(REF)
    from src.entropy_models.entropy_models import GaussianConditional
    from src.models.priors import get_scale_table
    from dcvc_tpu.entropy.compressai import (compressai_gaussian_bank,
                                             compressai_scale_table)

    _patch_ref_pmf()
    g = GaussianConditional(None)
    g.update_scale_table([float(s) for s in get_scale_table()], force=True)
    cdf, lengths, offsets = compressai_gaussian_bank(compressai_scale_table())

    ref_cdf = g._quantized_cdf.numpy()
    np.testing.assert_array_equal(lengths, g._cdf_length.numpy())
    np.testing.assert_array_equal(offsets, g._offset.numpy())
    assert cdf.shape == ref_cdf.shape
    np.testing.assert_array_equal(cdf, ref_cdf)
