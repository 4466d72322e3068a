"""NN building blocks, NHWC + bf16-friendly (reference src/layers/layers.py).

Design notes (TPU-first):
  * 1x1 convs on NHWC lower to plain matmuls over the channel dim -> MXU.
  * The DepthConvBlock FFN "WSiLU chunk-add" is expressed as a reshape-sum
    over a trailing factor-4 axis, which XLA fuses into the producing matmul
    epilogue (the role of the CUTLASS quad-GEMM in the reference).
  * Params are stored f32 (param_dtype) and cast to the compute dtype; the
    compute dtype is bf16 for inference speed, f32 for exactness tests.
"""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _fused_enabled():
    """Pallas fused-DCB gate: on for TPU inference unless disabled."""
    env = os.environ.get("DCVC_TPU_FUSED", "")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu"


def _fused_ok(x, cin, cout, inner, stacked=False):
    """Static shape gate for the fused kernel (see kernels/fused_dcb.py)."""
    if x.dtype != jnp.bfloat16 or not _fused_enabled():
        return False
    b, h, w = (x.shape[1], x.shape[2], x.shape[3]) if stacked \
        else (x.shape[0], x.shape[1], x.shape[2])
    if b != 1 or h % 2 or h < 4:
        return False
    if cin % 128 or cout % 128 or inner % 128 or cin > 1024:
        return False
    # input-tile VMEM bound even at the smallest row tile
    if 4 * w * cin * 2 > 3 * 1024 * 1024:
        return False
    return True


def wsilu(x):
    """Weighted SiLU: x * sigmoid(4x) (reference WSiLU, layers.py:106-111)."""
    return x * nn.sigmoid(4.0 * x)


class WSiLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return wsilu(x)


class _PointwiseConv(nn.Module):
    """1x1 conv expressed as a channel contraction (lax.dot_general).

    ~2x faster than XLA's conv lowering for these shapes on TPU (the MXU
    sees a plain matmul).  Param layout matches nn.Conv ((1, 1, I, O)
    kernel + (O,) bias) so checkpoints are interchangeable.
    """
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params=False):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        w2d = kernel.reshape(in_ch, self.features)
        if return_params:
            return w2d, bias
        w = w2d.astype(self.dtype)
        x = x.astype(self.dtype)
        y = lax.dot_general(
            x, w, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class Conv1x1(nn.Module):
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params=False):
        return _PointwiseConv(self.features, use_bias=self.use_bias,
                              dtype=self.dtype, name="conv")(
            x, return_params=return_params)


class Conv3x3(nn.Module):
    """3x3 conv, optionally strided (SAME padding == torch padding=1)."""
    features: int
    stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                       padding=((1, 1), (1, 1)), use_bias=self.use_bias,
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


class _DWParams(nn.Module):
    """Declares the same params nn.Conv would (shape, init, path) so the
    fused path can fetch them without running the conv."""
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 1, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class DepthwiseConv3x3(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params=False):
        if return_params:
            k, b = _DWParams(self.features, name="conv")()
            return k[:, :, 0, :], b
        return nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                       feature_group_count=self.features,
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


class DepthConvBlock(nn.Module):
    """Depth-conv block (reference DepthConvBlock, layers.py:128-159).

    dc branch:  1x1 -> WSiLU -> dw3x3 -> 1x1, residual.
    ffn branch: 1x1 (4x inner width) -> WSiLU -> 4-way chunk add -> 1x1,
                residual.  dcb2 halves the inner width.
    """
    in_ch: int
    out_ch: int
    dcb2: bool = False
    shortcut: bool = False
    force_adaptor: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ratio = 2 if self.dcb2 else 1
        if self.dcb2:
            assert not self.shortcut
        inner = self.out_ch // ratio
        has_adaptor = self.in_ch != self.out_ch or self.force_adaptor

        if _fused_ok(x, x.shape[-1], self.out_ch, inner):
            from ..kernels.fused_dcb import fused_dcb
            zc = jnp.zeros((1, 1, 1, self.out_ch), self.dtype)
            zi = jnp.zeros((1, 1, 1, inner), self.dtype)
            params = {}
            if has_adaptor:
                wa, ba = Conv1x1(self.out_ch, dtype=self.dtype,
                                 name="adaptor")(x, return_params=True)
                params.update(wa=wa, ba=ba)
            params["w1"], params["b1"] = Conv1x1(
                inner, dtype=self.dtype, name="dc_in")(zc, return_params=True)
            params["wd"], params["bd"] = DepthwiseConv3x3(
                inner, dtype=self.dtype, name="dc_dw")(zi, return_params=True)
            params["w2"], params["b2"] = Conv1x1(
                self.out_ch, dtype=self.dtype, name="dc_out")(
                zi, return_params=True)
            params["w3"], params["b3"] = Conv1x1(
                4 * inner, dtype=self.dtype, name="ffn_in")(
                zc, return_params=True)
            params["w4"], params["b4"] = Conv1x1(
                self.out_ch, dtype=self.dtype, name="ffn_out")(
                zi, return_params=True)
            return fused_dcb(x, params, shortcut=self.shortcut)

        if has_adaptor:
            x = Conv1x1(self.out_ch, dtype=self.dtype, name="adaptor")(x)

        h = Conv1x1(inner, dtype=self.dtype, name="dc_in")(x)
        h = wsilu(h)
        h = DepthwiseConv3x3(inner, dtype=self.dtype, name="dc_dw")(h)
        h = Conv1x1(self.out_ch, dtype=self.dtype, name="dc_out")(h)
        out = h + x

        f = Conv1x1(4 * inner, dtype=self.dtype, name="ffn_in")(out)
        f = wsilu(f)
        # chunk-add: channels (c*4 + j) summed over j, equivalent to the
        # reference's x[:, 0::4] + x[:, 1::4] + x[:, 2::4] + x[:, 3::4]
        f = f.reshape(*f.shape[:-1], inner, 4).sum(axis=-1)
        f = Conv1x1(self.out_ch, dtype=self.dtype, name="ffn_out")(f)
        out = f + out

        if self.shortcut:
            out = out + x
        return out


class StackedDCB(nn.Module):
    """S independent DepthConvBlocks evaluated as ONE batched program.

    The reference recon head runs 8 per-frame CNN decoders sequentially
    (video_model_ht.py:215-260); on TPU they batch into single stacked
    einsums (MXU batched matmul) plus a batched 9-shift depthwise conv —
    identical math per head, one kernel launch per op instead of eight,
    and much better MXU occupancy at /8-grid sizes.

    Input/output: (S, B, H, W, C); every param leaf carries a leading
    stack axis S.  Mirrors DepthConvBlock's dc + ffn-chunk-add topology.
    """
    stacks: int
    in_ch: int
    out_ch: int
    dcb2: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rows=None):
        """rows=(lo, hi): evaluate only that static sub-range of the
        stack (param layout stays full-shape / checkpoint-compatible).
        Lets the runtime dispatch the recon head in frame slices that
        fill the decode ladder's host-wait gaps."""
        S = self.stacks
        inner = self.out_ch // (2 if self.dcb2 else 1)
        dt = self.dtype
        winit = nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1,
            batch_axis=(0,))
        zeros = nn.initializers.zeros

        # Param layout is stacked, but the compute unrolls the stack axis
        # into S independent op chains inside ONE program: XLA fuses each
        # chain and pipelines them, while batched einsums over a leading
        # stack axis measured ~2x SLOWER at these shapes (relayouts
        # around the 5-D batch dims).
        def declare(name, ci, co):
            w = self.param(f"{name}_w", winit, (S, ci, co), jnp.float32)
            b = self.param(f"{name}_b", zeros, (S, co), jnp.float32)
            return w, b

        wa = declare("adaptor", self.in_ch, self.out_ch) \
            if self.in_ch != self.out_ch else None
        w1 = declare("dc_in", self.out_ch, inner)
        wd = self.param("dc_dw_w", nn.initializers.normal(0.02),
                        (S, 3, 3, inner), jnp.float32)
        bd = self.param("dc_dw_b", zeros, (S, inner), jnp.float32)
        w2 = declare("dc_out", inner, self.out_ch)
        w3 = declare("ffn_in", self.out_ch, 4 * inner)
        w4 = declare("ffn_out", inner, self.out_ch)

        if rows is not None:
            lo, hi = rows
            S = hi - lo
            sl = lambda a: a[lo:hi]
            wa = (sl(wa[0]), sl(wa[1])) if wa is not None else None
            w1 = (sl(w1[0]), sl(w1[1]))
            wd, bd = sl(wd), sl(bd)
            w2 = (sl(w2[0]), sl(w2[1]))
            w3 = (sl(w3[0]), sl(w3[1]))
            w4 = (sl(w4[0]), sl(w4[1]))

        if _fused_ok(x, self.in_ch, self.out_ch, inner, stacked=True):
            from ..kernels.fused_dcb import fused_dcb_stacked
            params = {"w1": w1[0], "b1": w1[1], "wd": wd, "bd": bd,
                      "w2": w2[0], "b2": w2[1], "w3": w3[0], "b3": w3[1],
                      "w4": w4[0], "b4": w4[1]}
            if wa is not None:
                params["wa"], params["ba"] = wa
            return fused_dcb_stacked(x.astype(dt), params)

        def pconv(v, wb, s):
            w, b = wb
            y = lax.dot_general(v, w[s].astype(dt), (((3,), (0,)), ((), ())),
                                preferred_element_type=dt)
            return y + b[s].astype(dt)

        H, W = x.shape[2], x.shape[3]

        def one(s, xs):
            xs = xs.astype(dt)
            if wa is not None:
                xs = pconv(xs, wa, s)
            h = wsilu(pconv(xs, w1, s))
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            d = None
            for dy in range(3):
                for dx in range(3):
                    c = hp[:, dy:dy + H, dx:dx + W, :] * wd[s, dy, dx].astype(dt)
                    d = c if d is None else d + c
            d = d + bd[s].astype(dt)
            out = pconv(d, w2, s) + xs
            f = wsilu(pconv(out, w3, s))
            f = f.reshape(*f.shape[:-1], inner, 4).sum(axis=-1)
            return pconv(f, w4, s) + out

        return jnp.stack([one(s, x[s]) for s in range(S)])


class SubpelConv2x(nn.Module):
    """conv(k) to 4*out channels -> pixel shuffle 2 (reference SubpelConv2x).

    Bias present iff kernel_size > 1 or force_bias, matching the reference.
    """
    out_ch: int
    kernel_size: int = 1
    force_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = (k - 1) // 2
        has_bias = (k > 1) or self.force_bias
        if k == 1:
            x = _PointwiseConv(self.out_ch * 4, use_bias=has_bias,
                               dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(self.out_ch * 4, (k, k),
                        padding=((pad, pad), (pad, pad)),
                        use_bias=has_bias, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv")(x)
        from ..core.shuffle import pixel_shuffle
        return pixel_shuffle(x, 2)


class ResidualBlockUpsample(nn.Module):
    """SubpelConv2x(1x1) + DepthConvBlock (reference ResidualBlockUpsample)."""
    in_ch: int
    out_ch: int
    dcb2: bool = False
    shortcut: bool = True
    force_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = SubpelConv2x(self.out_ch, 1, force_bias=self.force_bias,
                         dtype=self.dtype, name="up")(x)
        return DepthConvBlock(self.out_ch, self.out_ch, dcb2=self.dcb2,
                              shortcut=self.shortcut, dtype=self.dtype,
                              name="conv")(x)


class ResidualBlockWithStride2(nn.Module):
    """pixel_unshuffle(2) -> 1x1 -> DepthConvBlock (reference RBWS2)."""
    in_ch: int
    out_ch: int
    dcb2: bool = False
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..core.shuffle import pixel_unshuffle
        x = pixel_unshuffle(x, 2)
        x = Conv1x1(self.out_ch, dtype=self.dtype, name="down")(x)
        return DepthConvBlock(self.out_ch, self.out_ch, dcb2=self.dcb2,
                              shortcut=self.shortcut, dtype=self.dtype,
                              name="conv")(x)
