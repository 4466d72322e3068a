"""Layer-zoo tests: shape contracts + golden DepthConvBlock math vs a torch
oracle built from the reference block definition."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from torch import nn as tnn

from dcvc_tpu.layers import (
    DepthConvBlock, SubpelConv2x, ResidualBlockUpsample,
    ResidualBlockWithStride2, wsilu,
)


def test_wsilu():
    x = jnp.array([-2.0, 0.0, 1.0, 3.0])
    got = np.asarray(wsilu(x))
    want = x * (1 / (1 + np.exp(-4.0 * np.asarray(x))))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6)


class TorchDepthConvBlock(tnn.Module):
    """Oracle re-statement of the reference DepthConvBlock (layers.py:128-159)."""

    def __init__(self, in_ch, out_ch, dcb2=False, shortcut=False, force_adaptor=False):
        super().__init__()
        self.adaptor = None
        if in_ch != out_ch or force_adaptor:
            self.adaptor = tnn.Conv2d(in_ch, out_ch, 1)
        r = 2 if dcb2 else 1
        self.shortcut = shortcut

        class WSiLU(tnn.Module):
            def forward(self, x):
                return torch.sigmoid(4.0 * x) * x

        self.dc = tnn.Sequential(
            tnn.Conv2d(out_ch, out_ch // r, 1),
            WSiLU(),
            tnn.Conv2d(out_ch // r, out_ch // r, 3, padding=1, groups=out_ch // r),
            tnn.Conv2d(out_ch // r, out_ch, 1),
        )
        self.ffn_in = tnn.Conv2d(out_ch, out_ch * 4 // r, 1)
        self.ffn_act = WSiLU()
        self.ffn_out = tnn.Conv2d(out_ch // r, out_ch, 1)

    def forward(self, x):
        if self.adaptor is not None:
            x = self.adaptor(x)
        out = self.dc(x) + x
        f = self.ffn_act(self.ffn_in(out))
        f = f[:, 0::4] + f[:, 1::4] + f[:, 2::4] + f[:, 3::4]
        out = self.ffn_out(f) + out
        if self.shortcut:
            out = out + x
        return out


def _torch_conv_to_flax(conv):
    """torch Conv2d (O, I, kh, kw) -> flax {'kernel': (kh, kw, I, O), 'bias'}."""
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    p = {"kernel": w}
    if conv.bias is not None:
        p["bias"] = conv.bias.detach().numpy()
    return p


def _torch_dwconv_to_flax(conv):
    """torch depthwise Conv2d (C, 1, kh, kw) -> flax (kh, kw, 1, C)."""
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    return {"kernel": w, "bias": conv.bias.detach().numpy()}


def test_depth_conv_block_matches_torch_oracle():
    torch.manual_seed(0)
    in_ch, out_ch = 8, 12
    oracle = TorchDepthConvBlock(in_ch, out_ch).eval()

    block = DepthConvBlock(in_ch, out_ch)
    params = {
        "adaptor": {"conv": _torch_conv_to_flax(oracle.adaptor)},
        "dc_in": {"conv": _torch_conv_to_flax(oracle.dc[0])},
        "dc_dw": {"conv": _torch_dwconv_to_flax(oracle.dc[2])},
        "dc_out": {"conv": _torch_conv_to_flax(oracle.dc[3])},
        "ffn_in": {"conv": _torch_conv_to_flax(oracle.ffn_in)},
        "ffn_out": {"conv": _torch_conv_to_flax(oracle.ffn_out)},
    }
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 6, in_ch)).astype(np.float32)
    got = block.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = oracle(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5)


def test_depth_conv_block_dcb2_shapes():
    block = DepthConvBlock(16, 16, dcb2=True)
    x = jnp.zeros((1, 8, 8, 16))
    params = block.init(jax.random.PRNGKey(0), x)
    out = block.apply(params, x)
    assert out.shape == (1, 8, 8, 16)
    # dcb2 halves the inner width
    assert params["params"]["dc_in"]["conv"]["kernel"].shape == (1, 1, 16, 8)
    assert params["params"]["ffn_in"]["conv"]["kernel"].shape == (1, 1, 16, 32)


def test_subpel_conv2x():
    m = SubpelConv2x(6, kernel_size=1)
    x = jnp.zeros((1, 4, 4, 8))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 8, 8, 6)
    # kernel_size=1 without force_bias -> no bias (reference SubpelConv2x)
    assert "bias" not in params["params"]["conv"]


def test_residual_block_upsample_and_stride2_are_inverse_shapes():
    up = ResidualBlockUpsample(8, 12)
    down = ResidualBlockWithStride2(12, 8)
    x = jnp.zeros((1, 4, 4, 8))
    pu = up.init(jax.random.PRNGKey(0), x)
    y = up.apply(pu, x)
    assert y.shape == (1, 8, 8, 12)
    pd = down.init(jax.random.PRNGKey(1), y)
    z = down.apply(pd, y)
    assert z.shape == (1, 4, 4, 8)
