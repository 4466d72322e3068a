"""Vendored CompressAI image codecs for the DCVC/TCM baseline I-frame
path: cheng2020-anchor and bmshj2018-hyperprior.

Reference: DCVC-family/DCVC/src/models/waseda.py:28-95 (Cheng2020Anchor),
src/models/priors.py:200-418 (ScaleHyperprior / JointAutoregressive
HierarchicalPriors), src/layers/layers.py:50-152 (residual blocks),
src/zoo/image.py:27-33 (model registry).  The reference downloads these
as pretrained CompressAI checkpoints
(DCVC/checkpoints/download_compressai_models.py); here the same
architectures are native flax NHWC modules with a torch-import key map
(utils/torch_import.key_fn_compressai) so those checkpoints load
directly.

Models operate on [0, 1] RGB (CompressAI convention — NOT the UF
[-0.5, 0.5] range); forward returns likelihoods for training/estimated
bitrates, and the bitstream runtimes live in
runtime/compressai_codec.py.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.shuffle import pixel_shuffle
from .gdn import GDN


def _conv(ch, k, s=1, dtype=jnp.float32, name=None):
    return nn.Conv(ch, (k, k), strides=(s, s), padding=((k // 2, k // 2),) * 2,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def _deconv(ch, k, s, dtype=jnp.float32, name=None):
    """Torch ConvTranspose2d(padding=k//2, output_padding=s-1) parity
    (see legacy/dcvc_net.py:_deconv; torch weights are spatially flipped
    at import)."""
    pad = k // 2
    padding = ((pad, pad + s - 1), (pad, pad + s - 1))
    return nn.ConvTranspose(ch, (k, k), strides=(s, s), padding=padding,
                            dtype=dtype, param_dtype=jnp.float32, name=name)


class SubpelConv3x3(nn.Module):
    """subpel_conv3x3 (layers.py:56-60)."""
    out_ch: int
    r: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _conv(self.out_ch * self.r ** 2, 3, dtype=self.dtype,
                  name="conv")(x)
        return pixel_shuffle(x, self.r)


class ResidualBlock(nn.Module):
    """layers.py:128-152: conv3-lrelu-conv3-lrelu + identity."""
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _conv(self.out_ch, 3, dtype=self.dtype, name="conv1")(x)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = _conv(self.out_ch, 3, dtype=self.dtype, name="conv2")(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        return x + h


class ResidualBlockWithStride(nn.Module):
    """layers.py:68-100: conv3s2-lrelu-conv3-GDN + 1x1s2 shortcut."""
    out_ch: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _conv(self.out_ch, 3, self.stride, dtype=self.dtype,
                  name="conv1")(x)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = _conv(self.out_ch, 3, dtype=self.dtype, name="conv2")(h)
        h = GDN(self.out_ch, dtype=self.dtype, name="gdn")(h)
        if self.stride != 1:
            x = _conv(self.out_ch, 1, self.stride, dtype=self.dtype,
                      name="downsample")(x)
        return x + h


class ResidualBlockUpsample(nn.Module):
    """layers.py:102-126: subpel-lrelu-conv3-IGDN + subpel shortcut."""
    out_ch: int
    r: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = SubpelConv3x3(self.out_ch, self.r, dtype=self.dtype,
                          name="subpel_conv")(x)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = _conv(self.out_ch, 3, dtype=self.dtype, name="conv")(h)
        h = GDN(self.out_ch, inverse=True, dtype=self.dtype, name="igdn")(h)
        x = SubpelConv3x3(self.out_ch, self.r, dtype=self.dtype,
                          name="upsample")(x)
        return x + h


@dataclasses.dataclass(frozen=True)
class HyperpriorConfig:
    N: int = 128
    M: int = 192


# quality 1-5 use (128, 192); 6-8 use (192, 320) (CompressAI zoo)
BMSHJ2018_Q1_5 = HyperpriorConfig(128, 192)
BMSHJ2018_Q6_8 = HyperpriorConfig(192, 320)
TINY_HYPERPRIOR = HyperpriorConfig(16, 24)


class ScaleHyperprior(nn.Module):
    """bmshj2018-hyperprior (priors.py:200-349): scales-only gaussian
    conditional over a factorized hyper-latent."""
    cfg: HyperpriorConfig = BMSHJ2018_Q1_5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        N, M, d = self.cfg.N, self.cfg.M, self.dtype
        self.g_a_layers = [
            _conv(N, 5, 2, d), GDN(N, dtype=d),
            _conv(N, 5, 2, d), GDN(N, dtype=d),
            _conv(N, 5, 2, d), GDN(N, dtype=d),
            _conv(M, 5, 2, d)]
        self.g_s_layers = [
            _deconv(N, 5, 2, d), GDN(N, inverse=True, dtype=d),
            _deconv(N, 5, 2, d), GDN(N, inverse=True, dtype=d),
            _deconv(N, 5, 2, d), GDN(N, inverse=True, dtype=d),
            _deconv(3, 5, 2, d)]
        self.h_a_layers = [_conv(N, 3, 1, d), _conv(N, 5, 2, d),
                           _conv(N, 5, 2, d)]
        self.h_s_layers = [_deconv(N, 5, 2, d), _deconv(N, 5, 2, d),
                           _conv(M, 3, 1, d)]

    def g_a(self, x):
        for layer in self.g_a_layers:
            x = layer(x)
        return x

    def g_s(self, y):
        for layer in self.g_s_layers:
            y = layer(y)
        return y

    def h_a(self, y):
        x = jnp.abs(y)
        for i, layer in enumerate(self.h_a_layers):
            x = layer(x)
            if i < len(self.h_a_layers) - 1:
                x = nn.relu(x)
        return x

    def h_s(self, z_hat):
        x = z_hat
        for layer in self.h_s_layers:
            x = nn.relu(layer(x))
        return x

    def __call__(self, x, rng=None):
        """Training/estimation forward (priors.py:256-267).  Returns
        x_hat + y/z values and scales for likelihood computation."""
        y = self.g_a(x)
        z = self.h_a(y)
        if rng is not None:
            z_hat = z + jax.random.uniform(rng, z.shape, z.dtype, -0.5, 0.5)
            rng2 = jax.random.fold_in(rng, 1)
            y_hat = y + jax.random.uniform(rng2, y.shape, y.dtype, -0.5, 0.5)
        else:
            z_hat = jnp.round(z)
            y_hat = jnp.round(y)
        scales_hat = self.h_s(z_hat)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "y": y, "y_hat": y_hat, "z": z,
                "z_hat": z_hat, "scales_hat": scales_hat}


@dataclasses.dataclass(frozen=True)
class Cheng2020Config:
    N: int = 128


CHENG2020_Q1_3 = Cheng2020Config(128)
CHENG2020_Q4_6 = Cheng2020Config(192)
TINY_CHENG2020 = Cheng2020Config(16)


class Cheng2020Anchor(nn.Module):
    """cheng2020-anchor (waseda.py:28-95): residual-block transforms +
    joint autoregressive hierarchical prior (priors.py:421-488).
    The masked-conv context model is evaluated densely here (training /
    estimation); the serial AR bitstream path lives in
    runtime/compressai_codec.py."""
    cfg: Cheng2020Config = CHENG2020_Q1_3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        N, d = self.cfg.N, self.dtype
        self.g_a_layers = [
            ResidualBlockWithStride(N, dtype=d),
            ResidualBlock(N, dtype=d),
            ResidualBlockWithStride(N, dtype=d),
            ResidualBlock(N, dtype=d),
            ResidualBlockWithStride(N, dtype=d),
            ResidualBlock(N, dtype=d),
            _conv(N, 3, 2, d)]
        self.h_a_layers = [_conv(N, 3, 1, d), _conv(N, 3, 1, d),
                           _conv(N, 3, 2, d), _conv(N, 3, 1, d),
                           _conv(N, 3, 2, d)]
        self.h_s_layers = [
            _conv(N, 3, 1, d), SubpelConv3x3(N, 2, dtype=d),
            _conv(N * 3 // 2, 3, 1, d),
            SubpelConv3x3(N * 3 // 2, 2, dtype=d),
            _conv(N * 2, 3, 1, d)]
        self.g_s_layers = [
            ResidualBlock(N, dtype=d),
            ResidualBlockUpsample(N, dtype=d),
            ResidualBlock(N, dtype=d),
            ResidualBlockUpsample(N, dtype=d),
            ResidualBlock(N, dtype=d),
            ResidualBlockUpsample(N, dtype=d),
            ResidualBlock(N, dtype=d),
            SubpelConv3x3(3, 2, dtype=d)]
        # context_prediction: 5x5 masked type-A conv M -> 2M; params are
        # explicit leaves so the host AR runtime can fetch them directly
        self.ctx_kernel = self.param(
            "context_prediction_kernel",
            nn.initializers.lecun_normal(), (5, 5, N, 2 * N), jnp.float32)
        self.ctx_bias = self.param("context_prediction_bias",
                                   nn.initializers.zeros, (2 * N,),
                                   jnp.float32)
        self.ep_layers = [_conv(N * 10 // 3, 1, 1, d),
                          _conv(N * 8 // 3, 1, 1, d),
                          _conv(N * 2, 1, 1, d)]

    def g_a(self, x):
        for layer in self.g_a_layers:
            x = layer(x)
        return x

    def g_s(self, y):
        for layer in self.g_s_layers:
            y = layer(y)
        return y

    def h_a(self, y):
        x = y
        for i, layer in enumerate(self.h_a_layers):
            x = layer(x)
            if i < len(self.h_a_layers) - 1:
                x = nn.leaky_relu(x, negative_slope=0.01)
        return x

    def h_s(self, z_hat):
        x = z_hat
        for i, layer in enumerate(self.h_s_layers):
            x = layer(x)
            if i < len(self.h_s_layers) - 1:
                x = nn.leaky_relu(x, negative_slope=0.01)
        return x

    def entropy_parameters(self, v):
        for i, layer in enumerate(self.ep_layers):
            v = layer(v)
            if i < len(self.ep_layers) - 1:
                v = nn.leaky_relu(v, negative_slope=0.01)
        return v

    def _masked_conv(self, y_hat):
        """Dense type-A masked 5x5 conv (layers.py:21-47): the kernel is
        zeroed at/after the center tap, so only already-decoded
        neighbors contribute."""
        k = self.ctx_kernel                           # (5, 5, C, 2C)
        mask = jnp.ones((5, 5, 1, 1), k.dtype)
        mask = mask.at[2, 2:].set(0).at[3:].set(0)
        y = jax.lax.conv_general_dilated(
            y_hat.astype(self.dtype), (k * mask).astype(self.dtype),
            (1, 1), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.ctx_bias.astype(self.dtype)

    def __call__(self, x, rng=None):
        """Training/estimation forward (priors.py:488-510)."""
        y = self.g_a(x)
        z = self.h_a(y)
        if rng is not None:
            z_hat = z + jax.random.uniform(rng, z.shape, z.dtype, -0.5, 0.5)
            rng2 = jax.random.fold_in(rng, 1)
            y_hat = y + jax.random.uniform(rng2, y.shape, y.dtype, -0.5, 0.5)
        else:
            z_hat = jnp.round(z)
            y_hat = jnp.round(y)
        params = self.h_s(z_hat)
        ctx = self._masked_conv(y_hat)
        gp = self.entropy_parameters(jnp.concatenate([params, ctx], axis=-1))
        scales_hat, means_hat = jnp.split(gp, 2, axis=-1)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "y": y, "y_hat": y_hat, "z": z,
                "z_hat": z_hat, "scales_hat": scales_hat,
                "means_hat": means_hat}
