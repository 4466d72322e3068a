"""Fused DepthConvBlock Pallas kernel vs the XLA blocks.py path.

Runs in Pallas interpret mode on the CPU test platform; the same kernel
compiles natively on TPU (scripts/bench_dcb.py microbenchmarks it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.kernels.fused_dcb import (fused_dcb, fused_dcb_stacked,
                                        wsilu_f32)
from dcvc_tpu.layers.blocks import DepthConvBlock, StackedDCB


def _dcb_params_from_flax(p, has_adaptor):
    out = {
        "w1": p["dc_in"]["conv"]["kernel"][0, 0],
        "b1": p["dc_in"]["conv"]["bias"],
        "wd": p["dc_dw"]["conv"]["kernel"][:, :, 0, :],
        "bd": p["dc_dw"]["conv"]["bias"],
        "w2": p["dc_out"]["conv"]["kernel"][0, 0],
        "b2": p["dc_out"]["conv"]["bias"],
        "w3": p["ffn_in"]["conv"]["kernel"][0, 0],
        "b3": p["ffn_in"]["conv"]["bias"],
        "w4": p["ffn_out"]["conv"]["kernel"][0, 0],
        "b4": p["ffn_out"]["conv"]["bias"],
    }
    if has_adaptor:
        out["wa"] = p["adaptor"]["conv"]["kernel"][0, 0]
        out["ba"] = p["adaptor"]["conv"]["bias"]
    return out


@pytest.mark.parametrize("cin,cout,dcb2,shortcut,h,w", [
    (128, 128, False, False, 8, 16),
    (256, 128, False, False, 8, 18),   # adaptor + non-16-multiple width
    (128, 128, True, False, 6, 16),    # dcb2 (inner = C/2 = 64 -> pad? no:
                                       # inner 64 < 128, gate would refuse;
                                       # kernel itself still computes right)
    (128, 128, False, True, 4, 16),    # shortcut
])
def test_fused_dcb_matches_xla(cin, cout, dcb2, shortcut, h, w):
    if dcb2 and cout // 2 % 64 != 0:
        pytest.skip("inner too small")
    rng = jax.random.PRNGKey(0)
    block = DepthConvBlock(cin, cout, dcb2=dcb2, shortcut=shortcut,
                           dtype=jnp.float32)
    x = jax.random.normal(rng, (1, h, w, cin), jnp.float32)
    variables = block.init(jax.random.PRNGKey(1), x)
    ref = block.apply(variables, x)

    params = _dcb_params_from_flax(variables["params"],
                                   has_adaptor=cin != cout)
    got = fused_dcb(x, params, shortcut=shortcut, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_dcb_stacked_matches_xla():
    s, cin, cout, h, w = 3, 128, 128, 8, 16
    rng = jax.random.PRNGKey(0)
    block = StackedDCB(s, cin, cout, dtype=jnp.float32)
    x = jax.random.normal(rng, (s, 1, h, w, cin), jnp.float32)
    variables = block.init(jax.random.PRNGKey(1), x)
    ref = block.apply(variables, x)

    p = variables["params"]
    params = {
        "w1": p["dc_in_w"], "b1": p["dc_in_b"],
        "wd": p["dc_dw_w"], "bd": p["dc_dw_b"],
        "w2": p["dc_out_w"], "b2": p["dc_out_b"],
        "w3": p["ffn_in_w"], "b3": p["ffn_in_b"],
        "w4": p["ffn_out_w"], "b4": p["ffn_out_b"],
    }
    got = fused_dcb_stacked(x, params, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_dcb_stacked_adaptor():
    s, cin, cout, h, w = 2, 256, 128, 4, 16
    rng = jax.random.PRNGKey(0)
    block = StackedDCB(s, cin, cout, dtype=jnp.float32)
    x = jax.random.normal(rng, (s, 1, h, w, cin), jnp.float32)
    variables = block.init(jax.random.PRNGKey(1), x)
    ref = block.apply(variables, x)

    p = variables["params"]
    params = {
        "wa": p["adaptor_w"], "ba": p["adaptor_b"],
        "w1": p["dc_in_w"], "b1": p["dc_in_b"],
        "wd": p["dc_dw_w"], "bd": p["dc_dw_b"],
        "w2": p["dc_out_w"], "b2": p["dc_out_b"],
        "w3": p["ffn_in_w"], "b3": p["ffn_in_b"],
        "w4": p["ffn_out_w"], "b4": p["ffn_out_b"],
    }
    got = fused_dcb_stacked(x, params, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_wsilu_formula():
    x = jnp.linspace(-3, 3, 32)
    np.testing.assert_allclose(np.asarray(wsilu_f32(x)),
                               np.asarray(x * jax.nn.sigmoid(4.0 * x)),
                               rtol=1e-6)
