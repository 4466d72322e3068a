"""Parity test: import the reference torch DMCI's random-initialized
state_dict into our flax DMCI and compare the full deterministic forward
(x_hat) — validates the entire model topology + the checkpoint importer.

Skipped when the reference repo is not mounted.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "src")),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_dmci():
    import torch
    sys.path.insert(0, REF)
    from src.models.image_model import DMCI as RefDMCI
    torch.manual_seed(0)
    m = RefDMCI().eval()
    return m


def test_dmci_forward_parity(ref_dmci):
    import torch
    from dcvc_tpu.models.dmci import DMCI
    from dcvc_tpu.utils.torch_import import import_state_dict

    model = DMCI(dtype=jnp.float32)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init_fn = jax.jit(lambda r1, r2: model.init({"params": r1}, x0, 0, r2))
    params = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1))["params"]

    state_dict = {k: v.detach().numpy()
                  for k, v in ref_dmci.state_dict().items()}
    params, unused = import_state_dict(state_dict, params)
    assert unused == [], f"unmapped reference keys: {unused[:8]}"

    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    for c in range(3):
        x[0, :, :, c] = gaussian_filter(x[0, :, :, c], 3.0)
    x = np.clip(x, 0, 1) - 0.5
    qp = 7

    def nhwc(t):
        return np.transpose(t.detach().numpy(), (0, 2, 3, 1))

    with torch.no_grad():
        import torch.nn.functional  # noqa: F401
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        q_enc_t = ref_dmci.index_select_dim0(ref_dmci.q_scale_enc,
                                             torch.tensor([qp]))
        y_t = ref_dmci.enc(xt, q_enc_t)
        z_t = ref_dmci.hyper_enc(y_t)
        z_hat_t = torch.round(z_t)
        params_t = ref_dmci.y_prior_fusion(ref_dmci.hyper_dec(z_hat_t))
        sc_t, mn_t = params_t.chunk(2, 1)
        res_t = ref_dmci.forward_one_frame(xt, torch.tensor([qp]),
                                           recon_only=True)

    # continuous stages: tight tolerance (pure float accumulation noise)
    from dcvc_tpu.models.dmci import DMCI as DMCIType
    y_ours, z_int8 = jax.jit(lambda p, xx: model.apply(
        {"params": p}, xx, qp, method=DMCIType.analysis))(params,
                                                          jnp.asarray(x))
    q_y = np.asarray(params["q_scale_y_enc"])[qp]
    np.testing.assert_allclose(np.asarray(y_ours) / q_y, nhwc(y_t),
                               rtol=1e-3, atol=1e-4)

    yh, yw = y_ours.shape[1], y_ours.shape[2]
    z_hat_ours = jnp.asarray(nhwc(z_hat_t).astype(np.int8))
    scales, means, ctx = jax.jit(lambda p, z: model.apply(
        {"params": p}, z, yh, yw, method=DMCIType.prior0))(params,
                                                           z_hat_ours)
    np.testing.assert_allclose(np.asarray(scales), nhwc(sc_t),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(means), nhwc(mn_t),
                               rtol=1e-3, atol=1e-3)

    # full forward through the quantized path: round() boundary flips
    # amplify float noise with random weights, so compare statistically
    out = jax.jit(lambda p, xx: model.apply(
        {"params": p}, xx, qp, jax.random.PRNGKey(2)))(params,
                                                       jnp.asarray(x))
    got = np.asarray(out["x_hat"])
    want = nhwc(res_t)
    denom = np.abs(want).mean()
    assert np.abs(got - want).mean() / denom < 0.01, \
        f"x_hat relative mean error too large: " \
        f"{np.abs(got - want).mean() / denom}"
