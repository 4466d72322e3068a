"""Fused DepthConvBlock Pallas kernel — the TPU counterpart of the
reference's CUTLASS epilogue-fusion family (conv1x1_bias.cu:7-539,
d3x3.cu:4-25, and the SM90 quad-GEMM that fuses the 4-way FFN chunk-add,
sm90_gemm_tma_warpspecialized_cooperative_quad.h:16-31).

One kernel evaluates a whole DepthConvBlock:

    [adaptor 1x1] -> dc_in 1x1 -> WSiLU -> dw3x3 -> dc_out 1x1 (+res)
                  -> ffn chunk-matmuls with fused WSiLU+add -> ffn_out (+res)
                  [+ shortcut]

so each block reads its input from HBM once and writes its output once;
every intermediate lives in VMEM.  The XLA lowering round-trips the
activations between fusions (~5x the minimal HBM traffic at 1080p
shapes) and evaluates the depthwise conv as 9 full-tensor shifted adds.

Grid/tile design:
  * grid over row tiles (and the stack axis for StackedDCB); each
    program sees rows [i*TH-1, i*TH+TH+1) via three BlockSpec views of
    the same input (body + 1-row halos with clamped index maps), giving
    Mosaic's pipeliner the double-buffering for free;
  * the 3x3 depthwise conv runs on the VPU as 9 shifted MACs inside the
    tile; halo rows / padded columns are zeroed IN h-SPACE, which is
    where the reference's conv zero-padding semantically lives;
  * widths are padded to the sublane quantum so the (rows, W) -> (M,)
    merge before each MXU matmul is layout-free;
  * the FFN never materializes the 4x-wide activation: the chunk-add
    j-groups become 4 accumulated (C x I) matmuls (the quad-GEMM trick).

The FFN chunk grouping note: blocks.py stores ffn_in with output channel
(c*4 + j); the wrapper re-groups columns to j-major once per call (a
(C, 4I) gather XLA folds into the weight feed).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def wsilu_f32(x):
    return x * jax.nn.sigmoid(4.0 * x)


def _pick_th(h, w, cin, cout, inner):
    """Largest row-tile <= 8 dividing H whose working set (halo input,
    f32 dc intermediates, ffn chunks, double buffers) fits VMEM."""
    for th in (8, 4, 2, 1):
        if h % th:
            continue
        est = w * ((th + 2) * (2 * cin + 2 * cout + 8 * inner)
                   + th * (8 * inner + 6 * cout))
        if est > 12 * 1024 * 1024 and th > 1:
            continue
        return th
    return 1


def _dcb_kernel(xt_ref, xb_ref, xm_ref,
                wa_ref, ba_ref, w1_ref, b1_ref, wd_ref, bd_ref,
                w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
                out_ref, *, th, w, wp, shortcut, has_adaptor, cdt):
    i = pl.program_id(0) if len(out_ref.shape) == 3 else pl.program_id(1)
    nt = (pl.num_programs(0) if len(out_ref.shape) == 3
          else pl.num_programs(1))

    def _sq(ref):
        v = ref[:]
        return v if v.ndim <= 3 else v[0]

    xtop, xbody, xbot = _sq(xt_ref), _sq(xb_ref), _sq(xm_ref)
    x = jnp.concatenate([xtop, xbody, xbot], axis=0)      # (TH+2, W, C)
    if wp != w:
        x = jnp.pad(x, ((0, 0), (0, wp - w), (0, 0)))
    rows = th + 2
    cin = x.shape[-1]
    x2 = x.reshape(rows * wp, cin)

    def mm(a, wref, bref=None):
        wv = wref[:]
        wv = wv if wv.ndim == 2 else wv[0]
        y = jnp.dot(a, wv, preferred_element_type=jnp.float32)
        if bref is not None:
            bv = bref[:]
            bv = bv if bv.ndim == 1 else bv.reshape(-1)
            y = y + bv.astype(jnp.float32)
        return y

    if has_adaptor:
        x2 = mm(x2, wa_ref, ba_ref).astype(cdt)
    cw = x2.shape[-1]

    h = wsilu_f32(mm(x2, w1_ref, b1_ref))                 # (rows*WP, I) f32
    inner = h.shape[-1]
    h = h.reshape(rows, wp, inner)

    # zero invalid h positions: halo rows at image edges + padded cols
    # (this is where the reference dw-conv's zero padding lives)
    row_ids = lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 0)
    ok = jnp.ones((rows, wp, 1), jnp.bool_)
    ok = jnp.logical_and(ok, jnp.logical_or(i > 0, row_ids > 0))
    ok = jnp.logical_and(ok, jnp.logical_or(i < nt - 1, row_ids < rows - 1))
    if wp != w:
        col_ids = lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 1)
        ok = jnp.logical_and(ok, col_ids < w)
    h = jnp.where(ok, h, 0.0).astype(cdt)

    zcol = jnp.zeros((rows, 1, inner), cdt)
    hl = jnp.concatenate([zcol, h[:, :-1, :]], axis=1)    # left neighbor
    hr = jnp.concatenate([h[:, 1:, :], zcol], axis=1)     # right neighbor
    wd = wd_ref[:]
    wd = wd if wd.ndim == 3 else wd[0]                     # (3, 3, I)
    d = None
    for dy in range(3):
        for cols, dx in ((hl, 0), (h, 1), (hr, 2)):
            c = cols[dy:dy + th].astype(jnp.float32) * \
                wd[dy, dx].astype(jnp.float32)
            d = c if d is None else d + c
    bd = bd_ref[:]
    bd = bd if bd.ndim == 1 else bd.reshape(-1)
    d = (d + bd.astype(jnp.float32)).astype(cdt)          # (TH, WP, I)

    x_int = x2.reshape(rows, wp, cw)[1:th + 1].reshape(th * wp, cw)
    d2 = d.reshape(th * wp, inner)
    out1 = mm(d2, w2_ref, b2_ref) + x_int.astype(jnp.float32)
    out1c = out1.astype(cdt)                              # (TH*WP, C)

    # FFN: 4 accumulated chunk matmuls, never materializing 4*I lanes
    w3 = w3_ref[:]
    w3 = w3 if w3.ndim == 3 else w3[0]                    # (4, C, I)
    b3 = b3_ref[:]
    b3 = b3 if b3.ndim == 2 else b3[0]                    # (4, I)
    acc = None
    for j in range(4):
        f = wsilu_f32(jnp.dot(out1c, w3[j],
                              preferred_element_type=jnp.float32)
                      + b3[j].astype(jnp.float32))
        acc = f if acc is None else acc + f
    out2 = mm(acc.astype(cdt), w4_ref, b4_ref) + out1
    if shortcut:
        out2 = out2 + x_int.astype(jnp.float32)

    res = out2.astype(out_ref.dtype).reshape(th, wp, -1)[:, :w, :]
    if out_ref.shape[0] == th:
        out_ref[:] = res
    else:
        out_ref[0] = res


def _const0(ndim):
    return lambda *idx: (0,) * ndim


@functools.partial(
    jax.jit,
    static_argnames=("shortcut", "has_adaptor", "interpret"))
def _fused_dcb_stacked(x, wa, ba, w1, b1, wd, bd, w2, b2, w3g, b3g, w4, b4,
                       shortcut=False, has_adaptor=False, interpret=False):
    """x: (S, H, W, Cin); weights with leading S.  Returns (S, H, W, C)."""
    s, hh, ww, cin = x.shape
    cout = w4.shape[-1]
    # biases go in as (S, 1, C) so their block shapes satisfy the TPU
    # (8, 128)-divisible-or-full rule on the last two dims
    ba = ba.reshape(s, 1, -1)
    b1 = b1.reshape(s, 1, -1)
    bd = bd.reshape(s, 1, -1)
    b2 = b2.reshape(s, 1, -1)
    b4 = b4.reshape(s, 1, -1)
    th = _pick_th(hh, ww, cin, cout, w1.shape[-1])
    nt = hh // th
    wp = _round_up(ww, 16)
    cdt = x.dtype

    def xmap_body(si, i):
        return (si, i, 0, 0)

    def xmap_top(si, i):
        return (si, jnp.maximum(i * th - 1, 0), 0, 0)

    def xmap_bot(si, i):
        return (si, jnp.minimum((i + 1) * th, hh - 1), 0, 0)

    def wmap(shape):
        n = len(shape)
        return pl.BlockSpec((1,) + shape[1:], lambda si, i: (si,) + (0,) * (n - 1),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1, ww, cin), xmap_top, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, ww, cin), xmap_body, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ww, cin), xmap_bot, memory_space=pltpu.VMEM),
    ]
    weights = [wa, ba, w1, b1, wd, bd, w2, b2, w3g, b3g, w4, b4]
    in_specs += [wmap(wt.shape) for wt in weights]

    kern = functools.partial(
        _dcb_kernel, th=th, w=ww, wp=wp, shortcut=shortcut,
        has_adaptor=has_adaptor, cdt=cdt)
    flops_est = 2 * s * hh * ww * (
        (cin * cout if has_adaptor else 0)
        + cout * w1.shape[-1] * 3 + w1.shape[-1] * cout * 2
        + cout * w1.shape[-1] * 4)
    return pl.pallas_call(
        kern,
        grid=(s, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, ww, cout),
                               lambda si, i: (si, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, hh, ww, cout), cdt),
        cost_estimate=pl.CostEstimate(flops=flops_est,
                                      bytes_accessed=x.size * 4,
                                      transcendentals=s * hh * ww * 8),
        interpret=interpret,
    )(x, x, x, *weights)


def _regroup_ffn(w3, b3, inner):
    """blocks.py ffn_in column order is (c*4 + j); regroup to j-major
    (4, C, I) so the kernel's 4 chunk matmuls accumulate the chunk-add."""
    cin = w3.shape[-2]
    w3g = w3.reshape(*w3.shape[:-1], inner, 4)
    w3g = jnp.moveaxis(w3g, -1, -3)            # (..., 4, Cin, I)? no:
    # w3 (..., Cin, 4I) -> (..., Cin, I, 4) -> (..., 4, Cin, I)
    w3g = w3.reshape(*w3.shape[:-1], inner, 4)
    w3g = jnp.moveaxis(w3g, -1, w3.ndim - 2)
    b3g = b3.reshape(*b3.shape[:-1], inner, 4)
    b3g = jnp.moveaxis(b3g, -1, b3.ndim - 1)
    del cin
    return w3g, b3g


def fused_dcb(x, params, *, shortcut=False, interpret=False):
    """Single DepthConvBlock on (B=1, H, W, Cin).

    params: dict with optional 'wa'/'ba' (adaptor) and 'w1 b1 wd bd w2 b2
    w3 b3 w4 b4' in blocks.py layout: 1x1 kernels (Cin, Cout), dw kernel
    (3, 3, I), ffn_in (C, 4I) with (c*4+j) column order.
    """
    b, hh, ww, cin = x.shape
    assert b == 1
    inner = params["w1"].shape[-1]
    cdt = x.dtype

    def lift(v):
        return jnp.asarray(v, cdt)[None]

    has_adaptor = "wa" in params
    cout = params["w4"].shape[-1]
    wa = lift(params["wa"]) if has_adaptor else jnp.zeros((1, 1, 1), cdt)
    ba = lift(params["ba"]) if has_adaptor else jnp.zeros((1, 1), cdt)
    w3g, b3g = _regroup_ffn(jnp.asarray(params["w3"], cdt),
                            jnp.asarray(params["b3"], cdt), inner)
    out = _fused_dcb_stacked(
        x[0][None].reshape(1, hh, ww, cin).astype(cdt),
        wa, ba,
        lift(params["w1"]), lift(params["b1"]),
        lift(params["wd"]), lift(params["bd"]),
        lift(params["w2"]), lift(params["b2"]),
        w3g[None], b3g[None],
        lift(params["w4"]), lift(params["b4"]),
        shortcut=shortcut, has_adaptor=has_adaptor, interpret=interpret)
    del cout
    return out.reshape(1, hh, ww, -1)


def fused_dcb_stacked(x, params, *, shortcut=False, interpret=False):
    """StackedDCB: x (S, B=1, H, W, Cin), stacked weights (S leading).

    params keys: optional 'wa'/'ba'; 'w1 b1 wd bd w2 b2 w3 b3 w4 b4';
    wd is (S, 3, 3, I).
    """
    s, b, hh, ww, cin = x.shape
    assert b == 1
    inner = params["w1"].shape[-1]
    cdt = x.dtype

    def c(v):
        return jnp.asarray(v, cdt)

    has_adaptor = "wa" in params
    wa = c(params["wa"]) if has_adaptor else jnp.zeros((s, 1, 1), cdt)
    ba = c(params["ba"]) if has_adaptor else jnp.zeros((s, 1), cdt)
    w3g, b3g = _regroup_ffn(c(params["w3"]), c(params["b3"]), inner)
    out = _fused_dcb_stacked(
        x[:, 0].astype(cdt), wa, ba,
        c(params["w1"]), c(params["b1"]), c(params["wd"]), c(params["bd"]),
        c(params["w2"]), c(params["b2"]), w3g, b3g,
        c(params["w4"]), c(params["b4"]),
        shortcut=shortcut, has_adaptor=has_adaptor, interpret=interpret)
    return out[:, None]


def fused_supported(h, w, cin, cout, inner, batch):
    """Static gate: shapes the kernel handles efficiently."""
    return (batch == 1 and h % 2 == 0 and
            cin % 128 == 0 and cout % 128 == 0 and inner % 128 == 0)
