"""DCVC-TCM model tests: feature-domain DPB propagation."""

import jax
import jax.numpy as jnp
import numpy as np

from dcvc_tpu.legacy.dcvc_tcm import DMCTCM, TINY_TCM_CONFIG
import pytest

pytestmark = pytest.mark.slow


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 3.0)
    return [np.clip(np.roll(base, i, 1)
                    + rng.normal(0, 0.01, (h, w, 3)), 0, 1)[None]
            .astype(np.float32) for i in range(n)]


def test_tcm_chained_forward():
    model = DMCTCM(cfg=TINY_TCM_CONFIG, dtype=jnp.float32)
    frames = _frames(64, 64, 3)
    # init both feature-adaptor branches (I for intra seed, P for feature)
    v1 = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[1]),
                    jnp.asarray(frames[0]), None)
    v2 = model.init(jax.random.PRNGKey(1), jnp.asarray(frames[1]),
                    jnp.asarray(frames[0]),
                    jnp.zeros((1, 64, 64, TINY_TCM_CONFIG.ch_n)))

    def deep_merge(a, b):
        out = dict(a)
        for k, v in b.items():
            if k not in out:
                out[k] = v
            elif isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = deep_merge(out[k], v)
        return out

    variables = {"params": deep_merge(dict(v1["params"]),
                                      dict(v2["params"]))}

    out = model.apply(variables, jnp.asarray(frames[1]),
                      jnp.asarray(frames[0]), None)
    assert out["recon_image"].shape == (1, 64, 64, 3)
    assert np.isfinite(float(out["bpp"][0]))
    assert np.isfinite(float(out["me_mse"][0]))
    # propagate the feature-domain DPB
    out2 = model.apply(variables, jnp.asarray(frames[2]),
                       out["recon_image"], out["feature"])
    assert np.isfinite(float(out2["bpp"][0]))
