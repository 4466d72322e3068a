"""EVC mask-decay training (dcvc_tpu/train/mask_decay.py): the EVC
paper's sparsity-aided pruning — per-channel gates folded into conv1
weights, RD loss + decay on the gates only.

Checks the contract the technique implies:
- folding all-ones masks is a no-op (fold correctness),
- masking a hidden channel to zero == hard-pruning it (output-exact),
- under training with decay, gate magnitudes actually decay while the
  RD loss stays finite,
- with decay=0 the gates stay ~1 (the decay term, not the RD gradient,
  drives the sparsity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.legacy.evc import EVC, TINY_EVC_CONFIG
from dcvc_tpu.train.mask_decay import (
    create_mask_decay_state, fold_masks, init_masks, make_mask_decay_step,
    mask_sites, prune_masks, sparsity_report)
from dcvc_tpu.train.step import make_optimizer


@pytest.fixture(scope="module")
def setup():
    model = EVC(cfg=TINY_EVC_CONFIG, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    return model, params, x


def test_sites_cover_all_block_families(setup):
    _, params, _ = setup
    sites = mask_sites(params)
    names = {"/".join(p) for p, _ in sites}
    # encoder + decoder DepthConv/FFN blocks and hyper-side FFNs all
    # expose conv1/conv2 hidden channels
    assert any("enc" in n for n in names)
    assert any("dec" in n for n in names)
    assert any("y_prior_fusion" in n or "hyper" in n for n in names)
    assert len(sites) >= 15


def test_fold_ones_is_noop(setup):
    model, params, x = setup
    masks = init_masks(params)
    out_a = model.apply({"params": params}, x)
    out_b = model.apply({"params": fold_masks(params, masks)}, x)
    np.testing.assert_allclose(out_a["x_hat"], out_b["x_hat"], atol=1e-6)
    np.testing.assert_allclose(out_a["bpp"], out_b["bpp"], rtol=1e-6)


def test_zero_gate_equals_hard_prune(setup):
    """Zeroing a gate must equal removing the hidden channel: scale the
    same conv1 output channel by 0 directly in the weights."""
    model, params, x = setup
    masks = init_masks(params)
    key = sorted(masks)[0]
    m = masks[key].at[0].set(0.0).at[3].set(0.0)
    masks2 = dict(masks, **{key: m})
    out_masked = model.apply({"params": fold_masks(params, masks2)}, x)

    # independently verify against prune_masks on the same gates
    out_pruned = model.apply(
        {"params": fold_masks(params, prune_masks(masks2, 0.5))}, x)
    np.testing.assert_allclose(out_masked["x_hat"], out_pruned["x_hat"],
                               atol=1e-6)


def test_masks_decay_under_training(setup):
    model, params, x = setup
    tx = make_optimizer(1e-4, clip_norm=0.1)
    state = create_mask_decay_state(params, tx)
    masks = init_masks(params)
    step = jax.jit(make_mask_decay_step(model, tx, lam=0.1,
                                        mask_decay=3.0))
    m0 = float(sum(jnp.sum(jnp.abs(m)) for m in masks.values()))
    for _ in range(8):
        state, masks, metrics = step(state, masks, x)
    assert np.isfinite(float(metrics["loss"]))
    m1 = float(sum(jnp.sum(jnp.abs(m)) for m in masks.values()))
    assert m1 < 0.9 * m0, f"gates did not decay: {m0} -> {m1}"

    rep = sparsity_report(masks, thresh=0.8)
    assert rep["total_gates"] > 0
    assert 0.0 <= rep["overall"] <= 1.0


def test_no_decay_keeps_gates_alive(setup):
    model, params, x = setup
    tx = make_optimizer(1e-4, clip_norm=0.1)
    state = create_mask_decay_state(params, tx)
    masks = init_masks(params)
    step = jax.jit(make_mask_decay_step(model, tx, lam=0.1,
                                        mask_decay=0.0))
    for _ in range(4):
        state, masks, _ = step(state, masks, x)
    m_mean = float(np.mean([float(jnp.mean(jnp.abs(m)))
                            for m in masks.values()]))
    assert m_mean > 0.9, f"gates drifted without decay: {m_mean}"
