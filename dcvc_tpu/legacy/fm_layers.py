"""DCVC-FM layer zoo (reference DCVC-family/DCVC-FM/src/models/layers.py,
video_net.py): LeakyReLU-flavored depth-conv blocks, residual up/down
blocks, and the UNet2 used by ReconGeneration.  NHWC Flax modules."""

import flax.linen as nn
import jax.numpy as jnp

from ..core.shuffle import pixel_shuffle
from ..layers.blocks import _PointwiseConv


def lrelu(x, slope=0.01):
    return nn.leaky_relu(x, negative_slope=slope)


class ConvK(nn.Module):
    """kxk conv, SAME-style padding (torch padding=k//2)."""
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        p = k // 2
        if k == 1 and self.stride == 1:
            return _PointwiseConv(self.features, dtype=self.dtype,
                                  name="conv")(x)
        if k == 1:
            return nn.Conv(self.features, (1, 1),
                           strides=(self.stride, self.stride),
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="conv")(x)
        return nn.Conv(self.features, (k, k),
                       strides=(self.stride, self.stride),
                       padding=((p, p), (p, p)), dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)


class SubpelConv(nn.Module):
    """conv(k) to out*r^2 channels -> pixel shuffle r (subpel_conv3x3/1x1)."""
    out_ch: int
    r: int = 2
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvK(self.out_ch * self.r ** 2, kernel=self.kernel,
                  dtype=self.dtype, name="conv")(x)
        return pixel_shuffle(x, self.r)


class ResBlockFM(nn.Module):
    """lrelu -> conv3x3 -> lrelu -> conv3x3 + residual (reference ResBlock,
    video_net.py:26-44)."""
    channel: int
    slope: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = lrelu(x, self.slope)
        h = ConvK(self.channel, dtype=self.dtype, name="conv1")(h)
        h = lrelu(h, self.slope)
        h = ConvK(self.channel, dtype=self.dtype, name="conv2")(h)
        return x + h


class ResidualBlockWithStrideFM(nn.Module):
    """conv3x3(stride) -> lrelu -> conv3x3 -> lrelu(0.1) + strided
    downsample shortcut (reference ResidualBlockWithStride)."""
    out_ch: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvK(self.out_ch, stride=self.stride, dtype=self.dtype,
                  name="conv1")(x)
        h = lrelu(h, 0.01)
        h = ConvK(self.out_ch, dtype=self.dtype, name="conv2")(h)
        h = lrelu(h, 0.1)
        if self.stride > 1 or x.shape[-1] != self.out_ch:
            x = ConvK(self.out_ch, kernel=1, stride=self.stride,
                      dtype=self.dtype, name="downsample")(x)
        return h + x


class ResidualBlockUpsampleFM(nn.Module):
    """subpel1x1 up -> lrelu -> conv3x3 -> lrelu(0.1) + subpel1x1 shortcut
    (reference ResidualBlockUpsample)."""
    out_ch: int
    r: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = SubpelConv(self.out_ch, r=self.r, kernel=1, dtype=self.dtype,
                       name="subpel_conv")(x)
        h = lrelu(h)
        h = ConvK(self.out_ch, dtype=self.dtype, name="conv")(h)
        h = lrelu(h, 0.1)
        identity = SubpelConv(self.out_ch, r=self.r, kernel=1,
                              dtype=self.dtype, name="upsample")(x)
        return h + identity


class DepthConvFM(nn.Module):
    """1x1 -> lrelu -> dw3x3 -> 1x1 + residual (reference DepthConv)."""
    out_ch: int
    slope: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        identity = x
        if in_ch != self.out_ch:
            identity = ConvK(self.out_ch, kernel=1, dtype=self.dtype,
                             name="adaptor")(x)
        h = ConvK(in_ch, kernel=1, dtype=self.dtype, name="conv1")(x)
        h = lrelu(h, self.slope)
        h = nn.Conv(in_ch, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=in_ch, dtype=self.dtype,
                    param_dtype=jnp.float32, name="depth_conv")(h)
        h = ConvK(self.out_ch, kernel=1, dtype=self.dtype, name="conv2")(h)
        return h + identity


class ConvFFNFM(nn.Module):
    """1x1 expand -> lrelu -> 1x1 + residual (reference ConvFFN)."""
    slope: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        internal = max(min(in_ch * 4, 1024), in_ch * 2)
        h = ConvK(internal, kernel=1, dtype=self.dtype, name="conv1")(x)
        h = lrelu(h, self.slope)
        h = ConvK(in_ch, kernel=1, dtype=self.dtype, name="conv2")(h)
        return x + lrelu(h, self.slope)


class ConvFFN3FM(nn.Module):
    """Gated-ish FFN: split, two slopes, add (reference ConvFFN3)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        internal = in_ch * 2
        h = ConvK(internal * 2, kernel=1, dtype=self.dtype, name="conv")(x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        out = lrelu(x1, 0.1) + lrelu(x2, 0.01)
        return x + ConvK(in_ch, kernel=1, dtype=self.dtype,
                         name="conv_out")(out)


class DepthConvBlockFM(nn.Module):
    """DepthConv + ConvFFN (reference DepthConvBlock)."""
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = DepthConvFM(self.out_ch, dtype=self.dtype, name="dc")(x)
        return ConvFFNFM(dtype=self.dtype, name="ffn")(x)


class DepthConvBlock4FM(nn.Module):
    """DepthConv + ConvFFN3 (reference DepthConvBlock4)."""
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = DepthConvFM(self.out_ch, dtype=self.dtype, name="dc")(x)
        return ConvFFN3FM(dtype=self.dtype, name="ffn")(x)


def max_pool_2x(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


class UNet2(nn.Module):
    """3-level UNet over DepthConvBlock4 (reference UNet2,
    video_net.py:168-205)."""
    out_ch: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x1 = DepthConvBlock4FM(32, dtype=d, name="conv1")(x)
        x2 = max_pool_2x(x1)
        x2 = DepthConvBlock4FM(64, dtype=d, name="conv2")(x2)
        x3 = max_pool_2x(x2)
        x3 = DepthConvBlock4FM(128, dtype=d, name="conv3")(x3)
        for i in range(4):
            x3 = DepthConvBlock4FM(128, dtype=d, name=f"context_refine_{i}")(x3)
        u3 = SubpelConv(64, r=2, kernel=1, dtype=d, name="up3")(x3)
        u3 = DepthConvBlock4FM(64, dtype=d, name="up_conv3")(
            jnp.concatenate([x2, u3], axis=-1))
        u2 = SubpelConv(32, r=2, kernel=1, dtype=d, name="up2")(u3)
        return DepthConvBlock4FM(self.out_ch, dtype=d, name="up_conv2")(
            jnp.concatenate([x1, u2], axis=-1))
