"""EVC real-time image codec (reference DCVC-family/EVC/src/models/):
residual up/down blocks + depth-conv blocks, hyperprior with a dual
(2-pass cross-checkerboard) spatial prior, per-model q_basic * q_scale
anchors (4 rate points, interpolable).

Covers the base topology with the L/M/S channel-plan pairs
(EVC_LL/LM/LS/SL/ML/SS/MM/MS, image_model.py:203-258) and the
scalable-encoder variant (ScalableEVC: enc_num encoders whose latents
are progressively averaged, scalable_encoder_model.py:15-100).
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.masks import make_mask_2x, _phase_np
from ..core.quant import ste_round
from ..core.shuffle import pixel_shuffle
from ..entropy.gaussian import gaussian_prob_train, probs_to_bits
from ..models import common as mcommon
from .fm_layers import ConvK, DepthConvFM, ConvFFNFM, lrelu


@dataclasses.dataclass(frozen=True)
class EVCConfig:
    channels: tuple = (192, 192, 192, 192)   # enc plan: 2x, 4x, 8x, 16x
    dec_channels: tuple = None                # dec plan (None = channels)
    n: int = 192                              # latent/hyper channels
    anchor_num: int = 4
    # scalable-encoder variant (scalable_encoder_model.py): number of
    # progressive encoders and which one the forward uses
    enc_num: int = 1
    forward_enc_id: int = 0

    @property
    def dec_plan(self):
        return self.dec_channels or self.channels


# reference channel plans (image_model.py:203-258)
_L = (192, 192, 192, 192)
_M = (128, 128, 192, 192)
_S = (64, 64, 128, 192)

EVC_CONFIG = EVCConfig()
EVC_LL_CONFIG = EVCConfig(channels=_L, dec_channels=_L)
EVC_MM_CONFIG = EVCConfig(channels=_M, dec_channels=_M)
EVC_SS_CONFIG = EVCConfig(channels=_S, dec_channels=_S)
EVC_LM_CONFIG = EVCConfig(channels=_L, dec_channels=_M)
EVC_LS_CONFIG = EVCConfig(channels=_L, dec_channels=_S)
EVC_ML_CONFIG = EVCConfig(channels=_M, dec_channels=_L)
EVC_SL_CONFIG = EVCConfig(channels=_S, dec_channels=_L)
EVC_MS_CONFIG = EVCConfig(channels=_M, dec_channels=_S)
SCALABLE_EVC_CONFIG = EVCConfig(channels=_S, dec_channels=_L, enc_num=4,
                                forward_enc_id=3)
TINY_EVC_CONFIG = EVCConfig(channels=(8, 8, 8, 8), n=8)
TINY_SCALABLE_EVC_CONFIG = EVCConfig(channels=(8, 8, 8, 8), n=8,
                                     enc_num=3, forward_enc_id=2)


class EVCDepthConv(nn.Module):
    """1x1(+lrelu) -> dw(+lrelu) -> 1x1(+lrelu) + (strided) adaptor
    (reference EVC layers.DepthConv)."""
    out_ch: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        identity = x
        if self.stride != 1:
            identity = nn.Conv(self.out_ch, (2, 2), strides=(2, 2),
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="adaptor")(x)
        elif in_ch != self.out_ch:
            identity = ConvK(self.out_ch, kernel=1, dtype=self.dtype,
                             name="adaptor")(x)
        h = nn.Conv(in_ch, (1, 1), strides=(self.stride, self.stride),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        h = lrelu(h)
        h = nn.Conv(in_ch, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=in_ch, dtype=self.dtype,
                    param_dtype=jnp.float32, name="depth_conv")(h)
        h = lrelu(h)
        h = ConvK(self.out_ch, kernel=1, dtype=self.dtype, name="conv2")(h)
        h = lrelu(h)
        return h + identity


class EVCConvFFN(nn.Module):
    """1x1 -> ReLU -> 1x1 -> ReLU + residual."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = ConvK(in_ch * 4, kernel=1, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = ConvK(in_ch, kernel=1, dtype=self.dtype, name="conv2")(h)
        return x + nn.relu(h)


class EVCDepthConvBlock(nn.Module):
    out_ch: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = EVCDepthConv(self.out_ch, stride=self.stride, dtype=self.dtype,
                         name="dc")(x)
        return EVCConvFFN(dtype=self.dtype, name="ffn")(x)


class EVCResidualBlockWithStride(nn.Module):
    out_ch: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvK(self.out_ch, stride=self.stride, dtype=self.dtype,
                  name="conv1")(x)
        h = lrelu(h)
        h = ConvK(self.out_ch, dtype=self.dtype, name="conv2")(h)
        h = lrelu(h, 0.1)
        if self.stride != 1:
            x = nn.Conv(self.out_ch, (1, 1), strides=(self.stride,) * 2,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="downsample")(x)
        return h + x


class EVCResidualBlockUpsample(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def subpel(name):
            def f(v):
                v = ConvK(self.out_ch * 4, kernel=1, dtype=self.dtype,
                          name=name)(v)
                return pixel_shuffle(v, 2)
            return f
        h = subpel("subpel_conv")(x)
        h = lrelu(h)
        h = ConvK(self.out_ch, dtype=self.dtype, name="conv")(h)
        h = lrelu(h, 0.1)
        return h + subpel("upsample")(x)


class EVCHyperDCB(nn.Module):
    """EVC's hyperprior-side DepthConvBlock (hyperprior.py:7-63): lrelu
    DepthConv + the CAPPED ConvFFN (hidden = max(min(4C, 1024), 2C),
    lrelu 0.1) — unlike the enc/dec blocks' plain 4x ReLU FFN."""
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = DepthConvFM(self.out_ch, dtype=self.dtype, name="dc")(x)
        return ConvFFNFM(dtype=self.dtype, name="ffn")(x)


class EVCHyperBlockUpsample(nn.Module):
    """Hyper DCB + subpel upsample (hyperprior.py:66-74)."""
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = DepthConvFM(self.out_ch, dtype=self.dtype, name="dc")(x)
        x = ConvFFNFM(dtype=self.dtype, name="ffn")(x)
        x = ConvK(self.out_ch * 4, kernel=1, dtype=self.dtype,
                  name="up_conv")(x)
        return pixel_shuffle(x, 2)


class EVC(nn.Module):
    """EVC image codec, base topology (reference EVC, image_model.py:16-82)."""
    cfg: EVCConfig = EVC_CONFIG
    dtype: jnp.dtype = jnp.float32

    def _make_enc(self, plan, name):
        c2, c4, c8, c16 = plan
        d = self.dtype
        return nn.Sequential([
            EVCResidualBlockWithStride(c2, dtype=d),
            EVCDepthConvBlock(c2, dtype=d),
            EVCResidualBlockWithStride(c4, dtype=d),
            EVCDepthConvBlock(c4, dtype=d),
            EVCResidualBlockWithStride(c8, dtype=d),
            EVCDepthConvBlock(c8, dtype=d),
            ConvK(c16, stride=2, dtype=d),
        ], name=name)

    def setup(self):
        c, d = self.cfg, self.dtype
        N = c.n
        if c.enc_num > 1:
            # scalable-encoder variant: enc_num progressive encoders
            # (scalable_encoder_model.py:27-44)
            self.encs = [self._make_enc(c.channels, f"encs_{i}")
                         for i in range(c.enc_num)]
        else:
            self.enc = self._make_enc(c.channels, "enc")
        d2, d4, d8, d16 = c.dec_plan
        self.dec = nn.Sequential([
            EVCDepthConvBlock(d16, dtype=d),
            EVCResidualBlockUpsample(d8, dtype=d),
            EVCDepthConvBlock(d8, dtype=d),
            EVCResidualBlockUpsample(d4, dtype=d),
            EVCDepthConvBlock(d4, dtype=d),
            EVCResidualBlockUpsample(d2, dtype=d),
            EVCDepthConvBlock(d2, dtype=d),
        ])
        self.dec_out = ConvK(3 * 4, kernel=1, dtype=d)  # subpel_conv1x1 x2


        # hyper/prior blocks use the hyperprior.py DepthConvBlock
        # variant (capped lrelu FFN), NOT the enc/dec layers.py one
        self.hyper_enc = nn.Sequential([
            EVCHyperDCB(N, dtype=d),
            ConvK(N, stride=2, dtype=d),
            lambda x: lrelu(x),
            ConvK(N, stride=2, dtype=d),
        ])
        self.hyper_dec = nn.Sequential([
            EVCHyperBlockUpsample(N, dtype=d),
            EVCHyperBlockUpsample(N, dtype=d),
            EVCHyperDCB(N, dtype=d),
        ])
        self.y_prior_fusion = nn.Sequential([
            EVCHyperDCB(N * 2, dtype=d),
            EVCHyperDCB(N * 3, dtype=d),
        ])
        self.y_spatial_prior = nn.Sequential([
            EVCHyperDCB(N * 3, dtype=d),
            EVCHyperDCB(N * 2, dtype=d),
            EVCHyperDCB(N * 2, dtype=d),
        ])

        ones = nn.initializers.ones
        self.q_basic = self.param("q_basic", ones, (1, 1, 1, N))
        self.q_scale = self.param("q_scale", ones, (c.anchor_num, 1, 1, 1))

        self.bit_estimator_z = mcommon.BitEstimatorModule(1, N)

    def forward_dual_prior(self, y, means, scales, quant_step):
        """2-pass cross-checkerboard prior (reference common_model.py:76-131):
        channel halves take opposite spatial phases; the second pass is
        conditioned on the first."""
        b, h, w, cc = y.shape
        half = cc // 2
        m0_np = _phase_np(h, w, 0, 0) | _phase_np(h, w, 1, 1)
        mask_0 = m0_np[None, :, :, None]
        mask_1 = ~mask_0

        quant_step = jnp.maximum(quant_step, 0.5)
        y = y / quant_step
        y_0, y_1 = jnp.split(y, 2, axis=-1)
        scales_0, scales_1 = jnp.split(scales, 2, axis=-1)
        means_0, means_1 = jnp.split(means, 2, axis=-1)

        r00, q00, h00, s00 = mcommon.process_with_mask_train(
            y_0, scales_0, means_0, mask_0)
        r11, q11, h11, s11 = mcommon.process_with_mask_train(
            y_1, scales_1, means_1, mask_1)

        params = jnp.concatenate(
            [h00, h11, means, scales,
             jnp.broadcast_to(quant_step, y.shape).astype(y.dtype)], axis=-1)
        out = self.y_spatial_prior(params)
        scales_0, means_0, scales_1, means_1 = jnp.split(out, 4, axis=-1)

        r01, q01, h01, s01 = mcommon.process_with_mask_train(
            y_0, scales_0, means_0, mask_1)
        r10, q10, h10, s10 = mcommon.process_with_mask_train(
            y_1, scales_1, means_1, mask_0)

        y_res = jnp.concatenate([r00 + r01, r11 + r10], axis=-1)
        y_q = jnp.concatenate([q00 + q01, q11 + q10], axis=-1)
        y_hat = jnp.concatenate([h00 + h01, h11 + h10], axis=-1)
        scales_hat = jnp.concatenate([s00 + s01, s11 + s10], axis=-1)
        return y_res, y_q, y_hat * quant_step, scales_hat

    # ----------------------------------------- inference stage methods
    # (reference image_model.py:131-200; shared enc/dec programs)

    def _encode_latent(self, x):
        """Single encoder, or the scalable progressive average up to
        forward_enc_id (scalable_add with detach is a plain running mean
        at inference, scalable_encoder_model.py:15-24)."""
        c = self.cfg
        if c.enc_num <= 1:
            return self.enc(x)
        k = c.forward_enc_id
        ys = [self.encs[i](x) for i in range(k + 1)]
        return sum(ys) / (k + 1)

    def analysis(self, x, q_scale):
        curr_q = (q_scale * self.q_basic).astype(self.dtype)
        y = self._encode_latent(x.astype(self.dtype)) / curr_q
        z = self.hyper_enc(y)
        z_int = jnp.clip(jnp.round(z.astype(jnp.float32)),
                         -30000, 30000).astype(jnp.int16)
        return y.astype(jnp.float32), z_int

    def prior(self, z_int):
        params = self.y_prior_fusion(self.hyper_dec(
            z_int.astype(self.dtype)))
        q_step, scales, means = jnp.split(params, 3, axis=-1)
        return jnp.maximum(q_step, 0.5), scales, means

    def spatial(self, y_hat_0_merged, q_step, scales, means):
        params = jnp.concatenate(
            [y_hat_0_merged.astype(self.dtype), means, scales,
             jnp.broadcast_to(q_step, y_hat_0_merged.shape)
             .astype(self.dtype)], axis=-1)
        out = self.y_spatial_prior(params)
        s0, m0, s1, m1 = jnp.split(out, 4, axis=-1)
        return (jnp.concatenate([s0, s1], axis=-1),
                jnp.concatenate([m0, m1], axis=-1))

    def synthesis(self, y_hat_acc, q_scale):
        curr_q = (q_scale * self.q_basic).astype(jnp.float32)
        y_hat = y_hat_acc * curr_q
        x_hat = self.dec(y_hat.astype(self.dtype))
        x_hat = pixel_shuffle(self.dec_out(x_hat), 2)
        return jnp.clip(x_hat.astype(jnp.float32), 0.0, 1.0)

    def __call__(self, x, q_scale=None):
        """Training forward.  x: (B, H, W, 3) RGB [0, 1]; q_scale: scalar
        (defaults to the first anchor)."""
        d = self.dtype
        if q_scale is None:
            q_scale = self.q_scale[0, 0, 0, 0]
        curr_q = (q_scale * self.q_basic).astype(d)

        y = self._encode_latent(x.astype(d))
        y = y / curr_q

        z = self.hyper_enc(y)
        z_hat = ste_round(z)
        params = self.y_prior_fusion(self.hyper_dec(z_hat))
        q_step, scales, means = jnp.split(params, 3, axis=-1)
        y_res, y_q, y_hat, scales_hat = self.forward_dual_prior(
            y, means, scales, q_step)

        y_hat = y_hat * curr_q
        x_hat = self.dec(y_hat)
        x_hat = pixel_shuffle(self.dec_out(x_hat), 2)

        bits_y = jnp.sum(probs_to_bits(
            gaussian_prob_train(y_q, scales_hat)), axis=(1, 2, 3))
        bits_z = jnp.sum(mcommon.probs_to_bits(
            self.bit_estimator_z.get_prob(z_hat, 0)), axis=(1, 2, 3))

        pixel_num = x.shape[1] * x.shape[2]
        bpp_y = bits_y / pixel_num
        bpp_z = bits_z / pixel_num
        return {
            "x_hat": x_hat.astype(jnp.float32),
            "bpp": bpp_y + bpp_z,
            "bpp_y": bpp_y,
            "bpp_z": bpp_z,
        }
