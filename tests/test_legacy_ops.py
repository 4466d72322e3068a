"""Legacy motion/normalization ops vs torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dcvc_tpu.legacy import (
    flow_warp, bilinear_upsample_2x, avg_pool_2x, GDN, MESpynet,
)


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


def torch_flow_warp(im, flow):
    """Oracle: grid_sample(bilinear, border, align_corners=True) driven by
    pixel flow, as in the reference torch_warp."""
    b, c, h, w = im.shape
    xs = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(b, -1, h, -1)
    ys = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(b, -1, -1, w)
    grid = torch.cat([xs, ys], 1)
    flow_n = torch.cat([flow[:, 0:1] / ((w - 1.0) / 2.0),
                        flow[:, 1:2] / ((h - 1.0) / 2.0)], 1)
    return F.grid_sample(im, (grid + flow_n).permute(0, 2, 3, 1),
                         mode="bilinear", padding_mode="border",
                         align_corners=True)


class TestFlowWarp:
    def test_matches_grid_sample(self):
        rng = np.random.default_rng(0)
        im = rng.standard_normal((2, 12, 16, 3)).astype(np.float32)
        flow = (rng.standard_normal((2, 12, 16, 2)) * 3).astype(np.float32)
        got = np.asarray(flow_warp(jnp.asarray(im), jnp.asarray(flow)))
        want = torch_flow_warp(torch.from_numpy(nchw(im)),
                               torch.from_numpy(nchw(flow))).numpy()
        np.testing.assert_allclose(got, nhwc(want), rtol=1e-5, atol=1e-5)

    def test_zero_flow_identity(self):
        rng = np.random.default_rng(1)
        im = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
        out = flow_warp(im, jnp.zeros((1, 8, 8, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(im), atol=1e-6)

    def test_border_clamp(self):
        im = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        flow = jnp.full((1, 4, 4, 2), 100.0)  # way off the grid
        out = flow_warp(im, flow)
        np.testing.assert_allclose(np.asarray(out[0, :, :, 0]),
                                   np.full((4, 4), 15.0))


def test_bilinear_upsample_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 6, 7, 3)).astype(np.float32)
    got = np.asarray(bilinear_upsample_2x(jnp.asarray(x)))
    want = F.interpolate(torch.from_numpy(nchw(x)), scale_factor=2,
                         mode="bilinear", align_corners=False).numpy()
    np.testing.assert_allclose(got, nhwc(want), rtol=1e-4, atol=1e-5)


def test_avg_pool():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 10, 2)).astype(np.float32)
    got = np.asarray(avg_pool_2x(jnp.asarray(x)))
    want = F.avg_pool2d(torch.from_numpy(nchw(x)), 2, 2).numpy()
    np.testing.assert_allclose(got, nhwc(want), rtol=1e-6)


class TestGDN:
    def _torch_gdn(self, x, beta, gamma, inverse):
        from dcvc_tpu.core.quant import lower_bound  # noqa: F401
        pedestal = (2 ** -18) ** 2
        beta_t = torch.clamp_min(torch.from_numpy(beta),
                                 (1e-6 + pedestal) ** 0.5) ** 2 - pedestal
        gamma_t = torch.clamp_min(torch.from_numpy(gamma),
                                  2 ** -18) ** 2 - pedestal
        ch = x.shape[1]
        norm = F.conv2d(x ** 2, gamma_t.view(ch, ch, 1, 1), beta_t)
        norm = torch.sqrt(norm)
        return x * norm if inverse else x / norm

    def test_forward_matches_reference_math(self):
        rng = np.random.default_rng(4)
        ch = 6
        x = rng.standard_normal((2, 5, 5, ch)).astype(np.float32)
        gdn = GDN(ch=ch)
        variables = gdn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(gdn.apply(variables, jnp.asarray(x)))
        beta = np.asarray(variables["params"]["beta"])
        gamma = np.asarray(variables["params"]["gamma"])
        want = self._torch_gdn(torch.from_numpy(nchw(x)), beta, gamma,
                               False).numpy()
        np.testing.assert_allclose(got, nhwc(want), rtol=1e-4, atol=1e-6)

    def test_inverse(self):
        rng = np.random.default_rng(5)
        ch = 4
        x = jnp.asarray(rng.standard_normal((1, 4, 4, ch)).astype(np.float32))
        gdn = GDN(ch=ch)
        igdn = GDN(ch=ch, inverse=True)
        v = gdn.init(jax.random.PRNGKey(0), x)
        y = gdn.apply(v, x)
        back = igdn.apply(v, y)
        # GDN followed by IGDN with the same params is NOT an exact
        # inverse (norm computed on different inputs), but close for
        # small gamma
        assert np.abs(np.asarray(back) - np.asarray(x)).mean() < 0.5


def test_spynet_shapes_and_finite():
    rng = np.random.default_rng(6)
    im1 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    net = MESpynet()
    variables = net.init(jax.random.PRNGKey(0), im1, im2)
    flow = net.apply(variables, im1, im2)
    assert flow.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(flow)).all()

    # identical frames with zero-init last layer -> near-zero flow is not
    # guaranteed with random init, but output must stay bounded
    flow2 = net.apply(variables, im1, im1)
    assert np.isfinite(np.asarray(flow2)).all()
