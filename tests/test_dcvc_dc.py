"""DCVC-DC model tests: diverse contexts + anchor rate control."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

pytestmark = pytest.mark.slow

from dcvc_tpu.legacy.dcvc_dc import (
    DMCDC, TINY_DC_CONFIG, fine_q_scales, INDEX_MAP,
)


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 3.0)
    return [np.clip(np.roll(base, i, 1)
                    + rng.normal(0, 0.01, (h, w, 3)), 0, 1)[None]
            .astype(np.float32) for i in range(n)]


def _empty_dpb(frame):
    return {"ref_frame": jnp.asarray(frame), "ref_feature": None,
            "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}


def _deep_merge(a, b):
    out = dict(a)
    for k, v in b.items():
        if k not in out:
            out[k] = v
        elif isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
    return out


def test_dc_chained_frames():
    model = DMCDC(cfg=TINY_DC_CONFIG, dtype=jnp.float32)
    frames = _frames(64, 64, 3)
    dpb0 = _empty_dpb(frames[0])
    v1 = model.init({"params": jax.random.PRNGKey(0)},
                    jnp.asarray(frames[1]), dpb0, 0, 0,
                    jax.random.PRNGKey(1))
    out1, = (model.apply(v1, jnp.asarray(frames[1]), dpb0, 0, 0,
                         jax.random.PRNGKey(2)),)
    # second init materializes the filled-dpb adaptor branches
    v2 = model.init({"params": jax.random.PRNGKey(3)},
                    jnp.asarray(frames[2]), out1["dpb"], 1, 1,
                    jax.random.PRNGKey(4))
    variables = {"params": _deep_merge(dict(v2["params"]),
                                       dict(v1["params"]))}

    dpb = _empty_dpb(frames[0])
    for i, (q, fi) in enumerate(zip((0, 2), (0, 1))):
        out = model.apply(variables, jnp.asarray(frames[i + 1]), dpb,
                          q, fi, jax.random.PRNGKey(i))
        assert out["x_hat"].shape == (1, 64, 64, 3)
        assert np.isfinite(float(out["bpp"][0])), f"frame {i}"
        dpb = out["dpb"]
    for key in ("ref_frame", "ref_feature", "ref_mv_feature", "ref_y",
                "ref_mv_y"):
        assert dpb[key] is not None


def test_dc_fine_q_interpolation():
    anchors = [0.5, 1.0, 2.0, 8.0]
    fine = fine_q_scales(anchors, 64)
    assert fine.shape == (64,)
    assert abs(fine[0] - 0.5) < 1e-6 and abs(fine[-1] - 8.0) < 1e-5
    assert np.all(np.diff(fine) > 0)


def test_dc_index_map():
    assert INDEX_MAP == [0, 1, 0, 2]
