"""DCVC baseline (NeurIPS'21) model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.legacy.dcvc_net import (
    DCVCNet, TINY_DCVC_CONFIG, MaskedConv2d,
)


def _frame_pair(h, w, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 3.0)
    ref = np.clip(base, 0, 1)[None].astype(np.float32)
    cur = np.clip(np.roll(base, 2, 1) + rng.normal(0, 0.01, (h, w, 3)),
                  0, 1)[None].astype(np.float32)
    return ref, cur


def test_masked_conv_causality():
    """Type-A mask: output at (i, j) must not depend on (i, j) or any
    later raster position."""
    m = MaskedConv2d(4, kernel=5)
    x = jnp.zeros((1, 8, 8, 3))
    variables = m.init(jax.random.PRNGKey(0), x)

    base = np.asarray(m.apply(variables, x))
    # perturb the center pixel; outputs at and before it must not change
    x2 = x.at[0, 4, 4, :].set(10.0)
    out2 = np.asarray(m.apply(variables, x2))
    diff = np.abs(out2 - base).sum(-1)[0]
    assert diff[4, 4] == 0, "mask must exclude the current pixel"
    assert diff[4, :5].sum() == 0, "no dependence on left of current"
    assert diff[:4].sum() == 0, "no dependence on earlier rows"
    assert diff[5:].sum() > 0, "later rows should depend on it"


def test_dcvc_forward():
    model = DCVCNet(cfg=TINY_DCVC_CONFIG, dtype=jnp.float32)
    ref, cur = _frame_pair(64, 64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ref),
                           jnp.asarray(cur))
    out = model.apply(variables, jnp.asarray(ref), jnp.asarray(cur))
    assert out["recon_image"].shape == (1, 64, 64, 3)
    for key in ("bpp_y", "bpp_z", "bpp_mv_y", "bpp_mv_z", "bpp"):
        assert np.isfinite(float(out[key][0])), key
    assert float(out["bpp"][0]) > 0


def test_dcvc_grads():
    model = DCVCNet(cfg=TINY_DCVC_CONFIG, dtype=jnp.float32)
    ref, cur = _frame_pair(64, 64, seed=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ref),
                           jnp.asarray(cur))

    def loss_fn(params):
        out = model.apply({"params": params}, jnp.asarray(ref),
                          jnp.asarray(cur))
        mse = jnp.mean((out["recon_image"] - cur) ** 2)
        return 256.0 * mse + jnp.mean(out["bpp"])

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    total = sum(float(np.abs(np.asarray(g)).sum()) for g in leaves)
    assert total > 0
