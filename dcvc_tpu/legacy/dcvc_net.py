"""DCVC baseline (NeurIPS'21) — the conditional-coding origin of the
family.  Reference: DCVC-family/DCVC/src/models/DCVC_net.py.

SpyNet flow -> GDN motion auto-encoder with hyperprior + masked-conv
autoregressive entropy -> flow-warped feature context -> conditional
contextual coding (GDN analysis/synthesis, temporal prior + hyper +
AR context fusion, Laplace y likelihood).

The AR (PixelCNN-style) context model is parallel in training (one
masked conv); decoding is inherently serial and stays a documented slow
path as in the reference (DCVC_net.py:257-330).
"""

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.quant import ste_round
from ..core.shuffle import pixel_shuffle
from ..models import common as mcommon
from .gdn import GDN
from .ops import flow_warp
from .spynet import MESpynet


@dataclasses.dataclass(frozen=True)
class DCVCConfig:
    ch_mv: int = 128
    ch_n: int = 64
    ch_m: int = 96


DCVC_CONFIG = DCVCConfig()
TINY_DCVC_CONFIG = DCVCConfig(ch_mv=8, ch_n=8, ch_m=8)


def _conv(ch, k, s=1, dtype=jnp.float32, name=None):
    return nn.Conv(ch, (k, k), strides=(s, s), padding=((k // 2, k // 2),) * 2,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def _deconv(ch, k, s, dtype=jnp.float32, name=None):
    """ConvTranspose matching torch's (padding=k//2, output_padding=s-1).

    Empirically validated equivalence: flax padding (p, p + output_padding)
    reproduces torch's ConvTranspose2d output exactly (torch weights
    additionally need a spatial flip at import time).
    """
    pad = k // 2
    padding = ((pad, pad + s - 1), (pad, pad + s - 1))
    return nn.ConvTranspose(ch, (k, k), strides=(s, s), padding=padding,
                            dtype=dtype, param_dtype=jnp.float32, name=name)


class MaskedConv2d(nn.Module):
    """PixelCNN type-A masked conv (reference layers.py:21-43)."""
    features: int
    kernel: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        import numpy as np
        mask = np.ones((k, k, 1, 1), np.float32)
        mask[k // 2, k // 2:] = 0
        mask[k // 2 + 1:] = 0
        kernel = kernel * jnp.asarray(mask)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class ResBlockD(nn.Module):
    """relu -> conv -> relu -> conv + (adapted) residual (video_net
    ResBlock)."""
    out_ch: int
    k: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = _conv(self.out_ch, self.k, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = _conv(self.out_ch, self.k, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = _conv(self.out_ch, 1, dtype=self.dtype, name="adapt_conv")(x)
        return x + h


class ResBlockLRelu(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _conv(self.out_ch, 3, dtype=self.dtype, name="conv1")(x)
        h = nn.leaky_relu(h, negative_slope=0.1)
        h = _conv(self.out_ch, 3, dtype=self.dtype, name="conv2")(h)
        h = nn.leaky_relu(h, negative_slope=0.1)
        return x + h


class SubpelConv3x3(nn.Module):
    out_ch: int
    r: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _conv(self.out_ch * self.r ** 2, 3, dtype=self.dtype,
                  name="conv")(x)
        return pixel_shuffle(x, self.r)


def laplace_bits_sum(values, sigma):
    """Reference feature_probs_based_sigma rate estimate
    (DCVC_net.py:200-211): Laplace prob, clamp(-log2, 0, 50), sum."""
    sigma = jnp.clip(sigma.astype(jnp.float32), 1e-5, 1e10)
    v = values.astype(jnp.float32)

    def cdf(t):
        return 0.5 + 0.5 * jnp.sign(t) * (1.0 - jnp.exp(-jnp.abs(t) / sigma))

    probs = cdf(v + 0.5) - cdf(v - 0.5)
    bits = jnp.clip(-jnp.log(probs + 1e-5) / math.log(2.0), 0, 50)
    return jnp.sum(bits, axis=(1, 2, 3))


class DCVCNet(nn.Module):
    """DCVC baseline P-frame model (training forward)."""
    cfg: DCVCConfig = DCVC_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c, d = self.cfg, self.dtype
        N, M, MV = c.ch_n, c.ch_m, c.ch_mv

        self.optic_flow = MESpynet(dtype=d)

        self.feature_extract = nn.Sequential(
            [_conv(N, 3, dtype=d), ResBlockD(N, dtype=d)])
        self.context_refine = nn.Sequential(
            [ResBlockD(N, dtype=d), _conv(N, 3, dtype=d)])

        mv_enc = []
        for i in range(4):
            mv_enc.append(_conv(MV, 3, 2, dtype=d))
            if i < 3:
                mv_enc.append(GDN(MV, dtype=d))
        self.mv_encoder = nn.Sequential(mv_enc)

        mv_dec = []
        for i in range(4):
            out = 2 if i == 3 else MV
            mv_dec.append(_deconv(out, 3, 2, dtype=d))
            if i < 3:
                mv_dec.append(GDN(MV, inverse=True, dtype=d))
        self.mv_decoder_part1 = nn.Sequential(mv_dec)

        ref_net = [_conv(64, 3, dtype=d)]
        for _ in range(5):
            ref_net += [nn.leaky_relu, _conv(64, 3, dtype=d)]
        ref_net += [nn.leaky_relu, _conv(2, 3, dtype=d)]
        self.mv_decoder_part2 = nn.Sequential(ref_net)

        # conv5s2/GDN ladder with ResBlock_LeakyReLU_0_Point_1 blocks
        # after the first two GDNs (DCVC_net.py:80-90)
        self.contextual_encoder = nn.Sequential([
            _conv(N, 5, 2, dtype=d), GDN(N, dtype=d),
            ResBlockLRelu(N, dtype=d),
            _conv(N, 5, 2, dtype=d), GDN(N, dtype=d),
            ResBlockLRelu(N, dtype=d),
            _conv(N, 5, 2, dtype=d), GDN(N, dtype=d),
            _conv(M, 5, 2, dtype=d),
        ])

        self.contextual_decoder_part1 = nn.Sequential([
            SubpelConv3x3(N, dtype=d), GDN(N, inverse=True, dtype=d),
            SubpelConv3x3(N, dtype=d), GDN(N, inverse=True, dtype=d),
            ResBlockLRelu(N, dtype=d),
            SubpelConv3x3(N, dtype=d), GDN(N, inverse=True, dtype=d),
            ResBlockLRelu(N, dtype=d),
            SubpelConv3x3(N, dtype=d),
        ])
        self.contextual_decoder_part2 = nn.Sequential([
            _conv(N, 3, dtype=d), ResBlockD(N, dtype=d),
            ResBlockD(N, dtype=d), _conv(3, 3, dtype=d),
        ])

        self.prior_encoder = nn.Sequential([
            _conv(N, 3, dtype=d), nn.leaky_relu,
            _conv(N, 5, 2, dtype=d), nn.leaky_relu,
            _conv(N, 5, 2, dtype=d),
        ])
        self.prior_decoder = nn.Sequential([
            _deconv(M, 5, 2, dtype=d), nn.leaky_relu,
            _deconv(M, 5, 2, dtype=d), nn.leaky_relu,
            _deconv(M, 3, 1, dtype=d),
        ])
        self.mv_prior_encoder = nn.Sequential([
            _conv(N, 3, dtype=d), nn.leaky_relu,
            _conv(N, 5, 2, dtype=d), nn.leaky_relu,
            _conv(N, 5, 2, dtype=d),
        ])
        self.mv_prior_decoder = nn.Sequential([
            _deconv(N, 5, 2, dtype=d), nn.leaky_relu,
            _deconv(N * 3 // 2, 5, 2, dtype=d), nn.leaky_relu,
            _deconv(MV * 2, 3, 1, dtype=d),
        ])

        self.temporal_prior_encoder = nn.Sequential([
            _conv(N, 5, 2, dtype=d), GDN(N, dtype=d),
            _conv(N, 5, 2, dtype=d), GDN(N, dtype=d),
            _conv(N, 5, 2, dtype=d), GDN(N, dtype=d),
            _conv(M, 5, 2, dtype=d),
        ])

        self.auto_regressive = MaskedConv2d(M * 2, dtype=d)
        self.auto_regressive_mv = MaskedConv2d(MV * 2, dtype=d)

        self.entropy_parameters = nn.Sequential([
            _conv(M * 10 // 3, 1, dtype=d), nn.leaky_relu,
            _conv(M * 8 // 3, 1, dtype=d), nn.leaky_relu,
            _conv(M * 6 // 3, 1, dtype=d),
        ])
        self.entropy_parameters_mv = nn.Sequential([
            _conv(MV * 10 // 3, 1, dtype=d), nn.leaky_relu,
            _conv(MV * 8 // 3, 1, dtype=d), nn.leaky_relu,
            _conv(MV * 6 // 3, 1, dtype=d),
        ])

        self.bit_estimator_z = mcommon.BitEstimatorModule(1, N)
        self.bit_estimator_z_mv = mcommon.BitEstimatorModule(1, N)

    def motion_compensation(self, ref, mv):
        ref_feature = self.feature_extract(ref.astype(self.dtype))
        prediction = flow_warp(ref_feature, mv)
        return self.context_refine(prediction)

    def _z_bits(self, z, estimator):
        probs = estimator.get_prob(z, 0)
        bits = jnp.clip(-jnp.log(probs + 1e-5) / math.log(2.0), 0, 50)
        return jnp.sum(bits, axis=(1, 2, 3))

    # ----------------------------------------- inference stage methods
    #
    # Reference compress/decompress (DCVC_net.py:331-414).  The masked-
    # conv AR coding itself runs on the HOST (runtime/dcvc_codec.py
    # HostAR, the documented serial slow path mirroring
    # DCVC_net.py:257-330); these stages cover everything around it.

    def mv_analysis(self, x, ref):
        est_mv = self.optic_flow(x.astype(self.dtype),
                                 ref.astype(self.dtype))
        mv_feature = self.mv_encoder(est_mv)
        z_mv = self.mv_prior_encoder(mv_feature)
        z_int = jnp.clip(jnp.round(z_mv.astype(jnp.float32)),
                         -30000, 30000).astype(jnp.int16)
        return mv_feature.astype(jnp.float32), z_int

    def mv_prior(self, mv_z_int):
        return self.mv_prior_decoder(mv_z_int.astype(self.dtype)) \
            .astype(jnp.float32)

    def mv_synthesis(self, mv_y_hat, ref):
        """mv decode + refine + motion compensation + temporal prior."""
        mv_up = self.mv_decoder_part1(mv_y_hat.astype(self.dtype))
        refined = self.mv_decoder_part2(
            jnp.concatenate([mv_up, ref.astype(self.dtype)], axis=-1)) \
            + mv_up
        context = self.motion_compensation(ref, refined)
        temporal_params = self.temporal_prior_encoder(context)
        return context, temporal_params.astype(jnp.float32)

    def ctx_analysis(self, x, context):
        feature = self.contextual_encoder(
            jnp.concatenate([x.astype(self.dtype), context], axis=-1))
        z = self.prior_encoder(feature)
        z_int = jnp.clip(jnp.round(z.astype(jnp.float32)),
                         -30000, 30000).astype(jnp.int16)
        return feature.astype(jnp.float32), z_int

    def ctx_prior(self, z_int):
        return self.prior_decoder(z_int.astype(self.dtype)) \
            .astype(jnp.float32)

    def synthesis(self, y_hat, context):
        recon_feat = self.contextual_decoder_part1(
            y_hat.astype(self.dtype))
        recon = self.contextual_decoder_part2(
            jnp.concatenate([recon_feat, context], axis=-1))
        return jnp.clip(recon.astype(jnp.float32), 0.0, 1.0)

    def __call__(self, referframe, input_image):
        """Training forward (reference DCVC_net.forward, :414-465).
        Frames: (B, H, W, 3) RGB [0, 1]."""
        d = self.dtype
        x = input_image.astype(d)
        ref = referframe.astype(d)

        est_mv = self.optic_flow(x, ref)
        mv_feature = self.mv_encoder(est_mv)
        z_mv = self.mv_prior_encoder(mv_feature)
        z_mv_hat = ste_round(z_mv)
        params_mv = self.mv_prior_decoder(z_mv_hat)

        quant_mv = ste_round(mv_feature)
        ctx_params_mv = self.auto_regressive_mv(quant_mv)
        gaussian_params_mv = self.entropy_parameters_mv(
            jnp.concatenate([params_mv, ctx_params_mv], axis=-1))
        means_mv, scales_mv = jnp.split(gaussian_params_mv, 2, axis=-1)

        mv_upsample = self.mv_decoder_part1(quant_mv)
        mv_refined = self.mv_decoder_part2(
            jnp.concatenate([mv_upsample, ref], axis=-1)) + mv_upsample

        context = self.motion_compensation(ref, mv_refined)
        temporal_params = self.temporal_prior_encoder(context)

        feature = self.contextual_encoder(
            jnp.concatenate([x, context], axis=-1))
        z = self.prior_encoder(feature)
        z_hat = ste_round(z)
        params = self.prior_decoder(z_hat)

        y_hat = ste_round(feature)
        ctx_params = self.auto_regressive(y_hat)
        gaussian_params = self.entropy_parameters(
            jnp.concatenate([temporal_params, params, ctx_params], axis=-1))
        means, scales = jnp.split(gaussian_params, 2, axis=-1)

        recon_feat = self.contextual_decoder_part1(y_hat)
        recon_image = self.contextual_decoder_part2(
            jnp.concatenate([recon_feat, context], axis=-1))

        # rates: round(y - mean) under Laplace(0, scale); z factorized
        bits_y = laplace_bits_sum(ste_round(feature - means), scales)
        bits_mv = laplace_bits_sum(ste_round(mv_feature - means_mv),
                                   scales_mv)
        bits_z = self._z_bits(z_hat, self.bit_estimator_z)
        bits_mv_z = self._z_bits(z_mv_hat, self.bit_estimator_z_mv)

        pixel_num = x.shape[1] * x.shape[2]
        bpp_y = bits_y / pixel_num
        bpp_z = bits_z / pixel_num
        bpp_mv_y = bits_mv / pixel_num
        bpp_mv_z = bits_mv_z / pixel_num
        return {
            "bpp_y": bpp_y,
            "bpp_z": bpp_z,
            "bpp_mv_y": bpp_mv_y,
            "bpp_mv_z": bpp_mv_z,
            "bpp": bpp_y + bpp_z + bpp_mv_y + bpp_mv_z,
            "recon_image": recon_image.astype(jnp.float32),
            "context": context,
        }
