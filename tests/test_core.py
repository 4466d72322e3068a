"""Golden tests for core numerics vs independently-computed references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dcvc_tpu.core import (
    ste_round, lower_bound, pixel_shuffle, pixel_unshuffle,
    make_mask_2x, make_mask_4x, rgb2ycbcr, ycbcr2rgb,
    get_padding_size, pad_replicate_nhwc,
)


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


class TestShuffle:
    @pytest.mark.parametrize("r", [2, 8])
    def test_unshuffle_matches_torch(self, r):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 16, 24, 3)).astype(np.float32)
        got = pixel_unshuffle(jnp.asarray(x), r)
        want = F.pixel_unshuffle(torch.from_numpy(nchw(x)), r).numpy()
        np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=0, atol=0)

    @pytest.mark.parametrize("r", [2, 8])
    def test_shuffle_matches_torch(self, r):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 4, 6, 3 * r * r)).astype(np.float32)
        got = pixel_shuffle(jnp.asarray(x), r)
        want = F.pixel_shuffle(torch.from_numpy(nchw(x)), r).numpy()
        np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=0, atol=0)

    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
        assert jnp.allclose(pixel_shuffle(pixel_unshuffle(x, 8), 8), x)


class TestQuant:
    def test_ste_round_grad_is_identity(self):
        g = jax.grad(lambda x: jnp.sum(ste_round(x) ** 2))(jnp.array([0.3, 1.7]))
        # d/dx of round(x)^2 with STE = 2*round(x)
        np.testing.assert_allclose(np.asarray(g), [0.0, 4.0])

    def test_lower_bound_forward(self):
        x = jnp.array([-1.0, 0.5, 2.0])
        np.testing.assert_allclose(np.asarray(lower_bound(x, 0.11)),
                                   [0.11, 0.5, 2.0])

    def test_lower_bound_grad_semantics(self):
        # grad passes when x >= bound OR upstream grad < 0
        def f(x):
            return jnp.sum(lower_bound(x, 0.0) * jnp.array([1.0, 1.0, -1.0, -1.0]))
        x = jnp.array([1.0, -1.0, 1.0, -1.0])
        g = jax.grad(f)(x)
        # x=1 (above): pass +1; x=-1 upstream +1>0: block; x=1: pass -1;
        # x=-1 upstream -1<0: pass -1
        np.testing.assert_allclose(np.asarray(g), [1.0, 0.0, -1.0, -1.0])


class TestMasks:
    def _torch_one_mask(self, micro, H, W):
        mask = torch.tensor(micro, dtype=torch.bool)
        mask = mask.repeat((H + 1) // 2, (W + 1) // 2)
        return mask[:H, :W].numpy()

    @pytest.mark.parametrize("h,w,c", [(4, 4, 8), (6, 10, 4), (5, 7, 8)])
    def test_mask_4x(self, h, w, c):
        got = make_mask_4x(h, w, c)
        m0 = self._torch_one_mask(((1, 0), (0, 0)), h, w)
        m1 = self._torch_one_mask(((0, 1), (0, 0)), h, w)
        m2 = self._torch_one_mask(((0, 0), (1, 0)), h, w)
        m3 = self._torch_one_mask(((0, 0), (0, 1)), h, w)
        q = c // 4
        orders = [(m0, m1, m2, m3), (m3, m2, m1, m0), (m2, m3, m0, m1), (m1, m0, m3, m2)]
        for step, order in enumerate(orders):
            want = np.concatenate([np.repeat(m[:, :, None], q, 2) for m in order], 2)
            np.testing.assert_array_equal(np.asarray(got[step]), want)
        # steps tile the full tensor exactly once
        total = sum(np.asarray(m).astype(int) for m in got)
        np.testing.assert_array_equal(total, np.ones((h, w, c)))

    @pytest.mark.parametrize("h,w,c", [(4, 4, 8), (6, 10, 4)])
    def test_mask_2x(self, h, w, c):
        got = make_mask_2x(h, w, c)
        m0 = self._torch_one_mask(((1, 0), (0, 1)), h, w)
        m1 = self._torch_one_mask(((0, 1), (1, 0)), h, w)
        half = c // 2
        want0 = np.concatenate([np.repeat(m0[:, :, None], half, 2),
                                np.repeat(m1[:, :, None], half, 2)], 2)
        np.testing.assert_array_equal(np.asarray(got[0]), want0)
        total = np.asarray(got[0]).astype(int) + np.asarray(got[1]).astype(int)
        np.testing.assert_array_equal(total, np.ones((h, w, c)))


class TestColor:
    def test_rgb_ycbcr_roundtrip(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(0.1, 0.9, (2, 8, 8, 3)).astype(np.float32))
        y = rgb2ycbcr(x)
        back = ycbcr2rgb(y)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)

    def test_matches_reference_formula(self):
        rng = np.random.default_rng(4)
        x = rng.uniform(0, 1, (1, 4, 4, 3)).astype(np.float32)
        got = np.asarray(rgb2ycbcr(jnp.asarray(x)))
        Kr, Kg, Kb = 0.2126, 0.7152, 0.0722
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        yy = Kr * r + Kg * g + Kb * b
        cb = 0.5 * (b - yy) / (1 - Kb) + 0.5
        cr = 0.5 * (r - yy) / (1 - Kr) + 0.5
        want = np.clip(np.stack([yy, cb, cr], -1), 0, 1)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestPadding:
    def test_padding_size(self):
        assert get_padding_size(1080, 1920, 64) == (0, 8)
        assert get_padding_size(100, 100, 64) == (28, 28)

    def test_replicate_pad(self):
        x = jnp.arange(12, dtype=jnp.float32).reshape(1, 2, 3, 2)
        out = pad_replicate_nhwc(x, 1, 2)
        assert out.shape == (1, 3, 5, 2)
        np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(out[0, 1]))
        np.testing.assert_allclose(np.asarray(out[0, :, 4]), np.asarray(out[0, :, 2]))
