"""DCVC-HEM model tests: latent propagation + dual prior."""

import jax
import jax.numpy as jnp
import numpy as np

from dcvc_tpu.legacy.dcvc_hem import DMCHEM, TINY_HEM_CONFIG
import pytest

pytestmark = pytest.mark.slow


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 3.0)
    return [np.clip(np.roll(base, i, 1)
                    + rng.normal(0, 0.01, (h, w, 3)), 0, 1)[None]
            .astype(np.float32) for i in range(n)]


def _deep_merge(a, b):
    out = dict(a)
    for k, v in b.items():
        if k not in out:
            out[k] = v
        elif isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
    return out


def _init_hem(model, frames):
    """Init twice: the feature adaptor branches (I vs P) materialize
    different params."""
    dpb0 = {"ref_frame": jnp.asarray(frames[0]), "ref_feature": None,
            "ref_y": None, "ref_mv_y": None}
    v1 = model.init({"params": jax.random.PRNGKey(0)},
                    jnp.asarray(frames[1]), dpb0,
                    rng=jax.random.PRNGKey(1))
    n = model.cfg.ch_n
    dpb_p = dict(dpb0)
    dpb_p["ref_feature"] = jnp.zeros((1, 64, 64, n), jnp.float32)
    v2 = model.init({"params": jax.random.PRNGKey(2)},
                    jnp.asarray(frames[1]), dpb_p,
                    rng=jax.random.PRNGKey(3))
    return {"params": _deep_merge(dict(v1["params"]), dict(v2["params"]))}


def test_hem_chained_latent_propagation():
    model = DMCHEM(cfg=TINY_HEM_CONFIG, dtype=jnp.float32)
    frames = _frames(64, 64, 3)
    dpb = {"ref_frame": jnp.asarray(frames[0]), "ref_feature": None,
           "ref_y": None, "ref_mv_y": None}
    variables = _init_hem(model, frames)
    out = model.apply(variables, jnp.asarray(frames[1]), dpb,
                      rng=jax.random.PRNGKey(2))
    assert out["dpb"]["ref_frame"].shape == (1, 64, 64, 3)
    assert np.isfinite(float(out["bpp"][0]))
    assert np.isfinite(float(out["me_mse"][0]))
    # second frame: latent-domain propagation (ref_y / ref_mv_y filled);
    # zeros-substitution keeps the same param tree, no re-init needed
    out2 = model.apply(variables, jnp.asarray(frames[2]), out["dpb"],
                       rng=jax.random.PRNGKey(3))
    assert np.isfinite(float(out2["bpp"][0]))
    assert np.isfinite(float(out2["mse"][0]))


def test_hem_rate_anchor():
    model = DMCHEM(cfg=TINY_HEM_CONFIG, dtype=jnp.float32)
    frames = _frames(64, 64, 2, seed=1)
    dpb = {"ref_frame": jnp.asarray(frames[0]), "ref_feature": None,
           "ref_y": None, "ref_mv_y": None}
    variables = _init_hem(model, frames)
    fine = model.apply(variables, jnp.asarray(frames[1]), dpb,
                       y_q_scale=0.5, rng=jax.random.PRNGKey(2))
    coarse = model.apply(variables, jnp.asarray(frames[1]), dpb,
                         y_q_scale=8.0, rng=jax.random.PRNGKey(2))
    assert float(coarse["bpp_y"][0]) < float(fine["bpp_y"][0])
