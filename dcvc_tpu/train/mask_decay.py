"""EVC mask-decay training (the paper's sparsity-aided pruning).

EVC ("Towards Real-Time Neural Image Compression with Mask Decay",
ICLR'23) derives its small encoder/decoder variants (the M/S channel
plans, reference EVC/src/models/image_model.py:203-258) by inserting
per-channel gate masks into the large model, fine-tuning with *decay
applied only to the masks* (plain RD gradients keep the useful channels
alive while the decay term pulls unused ones to zero), then pruning the
channels whose gates collapsed.

TPU-first formulation: instead of new mask modules inside the network,
masks live OUTSIDE the model as a small pytree and are *folded into the
producing conv's parameters* before `model.apply` — scaling a conv's
output channel k by m[k] is exactly equivalent to masking its output.
The fold is differentiable, so one jitted step trains params and masks
jointly with zero topology changes and zero extra HBM traffic (XLA
fuses the scale into the conv weights at trace time).

Maskable sites: every hidden channel produced by a `conv1` that feeds a
sibling `conv2` (EVC's DepthConv / ConvFFN / ResidualBlockWithStride /
hyper FFN blocks all use this naming).  A hidden channel whose gate hits
zero contributes nothing downstream (lrelu(0) == 0, depthwise convs are
channel-local), so hard-pruning it is output-exact.
"""

import jax
import jax.numpy as jnp
import optax

from .step import TrainState


def _conv_leaf(node):
    """ConvK wraps its nn.Conv in a child named 'conv'; plain nn.Conv
    keeps kernel/bias at the top."""
    if "kernel" in node:
        return node
    if "conv" in node and "kernel" in node["conv"]:
        return node["conv"]
    return None


def mask_sites(params):
    """Paths (tuples of keys) to every block holding a prunable
    conv1->conv2 hidden-channel pair, with the hidden width."""
    sites = []

    def walk(node, path):
        if not isinstance(node, dict):
            return
        if "conv1" in node and "conv2" in node:
            c1 = _conv_leaf(node["conv1"])
            if c1 is not None:
                sites.append((path, int(c1["kernel"].shape[-1])))
        for k, v in node.items():
            walk(v, path + (k,))

    walk(params, ())
    return sites


def init_masks(params):
    """All-ones gate per maskable hidden channel, keyed by '/'-joined
    block path."""
    return {"/".join(p): jnp.ones((c,), jnp.float32)
            for p, c in mask_sites(params)}


def fold_masks(params, masks):
    """Scale each site's conv1 kernel out-axis (and bias) by its gate.
    Differentiable in both params and masks."""

    def fold_one(tree, keys, m):
        k = keys[0]
        sub = tree[k]
        if len(keys) == 1:
            c1 = dict(sub["conv1"])
            tgt = "conv" if "kernel" not in c1 else None
            leaf = dict(c1[tgt]) if tgt else c1
            leaf["kernel"] = leaf["kernel"] * m
            if "bias" in leaf:
                leaf["bias"] = leaf["bias"] * m
            if tgt:
                c1[tgt] = leaf
            new_sub = dict(sub)
            new_sub["conv1"] = c1
        else:
            new_sub = fold_one(sub, keys[1:], m)
        new_tree = dict(tree)
        new_tree[k] = new_sub
        return new_tree

    for path, m in masks.items():
        params = fold_one(params, tuple(path.split("/")), m)
    return params


def sparsity_report(masks, thresh=0.02):
    """Fraction of gates below `thresh` per site and overall."""
    per_site = {k: float(jnp.mean(jnp.abs(m) < thresh))
                for k, m in masks.items()}
    total = sum(int(m.size) for m in masks.values())
    dead = sum(int(jnp.sum(jnp.abs(m) < thresh)) for m in masks.values())
    return {"overall": dead / max(total, 1), "per_site": per_site,
            "total_gates": total, "dead_gates": dead}


def prune_masks(masks, thresh=0.02):
    """Hard-zero every gate below `thresh` (output-exact for the folded
    model: the pruned hidden channels were already contributing ~0)."""
    return {k: jnp.where(jnp.abs(m) < thresh, 0.0, m)
            for k, m in masks.items()}


def make_mask_decay_step(model, tx, lam, mask_decay):
    """One jitted mask-decay fine-tune step for an EVC-style image model
    (forward returns x_hat + bpp).

    Loss = lam * mse + bpp; gradients flow to params AND masks through
    the fold; masks additionally receive the decay pull
    `mask_decay * m` (L2 decay on the gates ONLY — the paper's key
    trick: decaying all weights hurts RD, decaying just the gates
    performs the pruning search).
    """

    def loss_fn(params_and_masks, x):
        params, masks = params_and_masks
        folded = fold_masks(params, masks)
        out = model.apply({"params": folded}, x)
        mse = jnp.mean((out["x_hat"] - x) ** 2)
        bpp = jnp.mean(out["bpp"])
        loss = lam * mse + bpp
        return loss, {"mse": mse, "bpp": bpp}

    def step(state, masks, x):
        # EVC is an RGB [0,1] codec (legacy/evc.py __call__)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.params, masks), x)
        g_params, g_masks = grads
        # decay applies ONLY to gates
        g_masks = jax.tree.map(lambda g, m: g + mask_decay * m,
                               g_masks, masks)
        updates, opt_state = tx.update(g_params, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        # plain SGD on the gates (bounded [0, inf) not enforced; decay
        # plus RD gradient settles live gates near 1)
        lr = 1e-2
        masks = jax.tree.map(lambda m, g: m - lr * g, masks, g_masks)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, masks, {"loss": loss, **aux}

    return step


def create_mask_decay_state(params, tx):
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))
