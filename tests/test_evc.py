"""EVC image codec tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dcvc_tpu.legacy.evc import EVC, TINY_EVC_CONFIG
import pytest

pytestmark = pytest.mark.slow


def _image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    x = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), 3.0)
    return np.clip(x, 0, 1)[None].astype(np.float32)


def test_evc_forward_and_rates():
    model = EVC(cfg=TINY_EVC_CONFIG, dtype=jnp.float32)
    x = jnp.asarray(_image(64, 64))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["x_hat"].shape == (1, 64, 64, 3)
    assert np.isfinite(float(out["bpp"][0]))
    assert float(out["bpp_y"][0]) > 0 and float(out["bpp_z"][0]) > 0


def test_evc_rate_anchor_scaling():
    """A larger q_scale quantizes more coarsely -> fewer bits."""
    model = EVC(cfg=TINY_EVC_CONFIG, dtype=jnp.float32)
    x = jnp.asarray(_image(64, 64, seed=1))
    variables = model.init(jax.random.PRNGKey(0), x)
    bpp_fine = float(model.apply(variables, x, q_scale=0.5)["bpp_y"][0])
    bpp_coarse = float(model.apply(variables, x, q_scale=8.0)["bpp_y"][0])
    assert bpp_coarse < bpp_fine


def test_evc_grads():
    model = EVC(cfg=TINY_EVC_CONFIG, dtype=jnp.float32)
    x = jnp.asarray(_image(64, 64, seed=2))
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params):
        out = model.apply({"params": params}, x)
        return 256 * jnp.mean((out["x_hat"] - x) ** 2) + jnp.mean(out["bpp"])

    grads = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
