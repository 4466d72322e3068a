"""DCVC-FM P-frame codec (reference DCVC-family/DCVC-FM/src/models/
video_model.py): SpyNet motion estimation, offset-diversity motion
compensation over a 3-scale feature pyramid, conditional contextual
coding with hyper + temporal priors, quadtree 4-part spatial prior
(scales+means), Laplace y likelihood, and single-model wide bitrate range
via log-interpolated quant scalars between two anchors (64 q_indexes).

This module provides the full training forward; the bitstream runtime
reuses the dcvc_tpu runtime machinery (two-stream mv+y coding lands with
the FM eval config).  RGB domain in [0, 1] like the reference.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.quant import ste_round
from ..entropy.gaussian import probs_to_bits
from ..models import common as mcommon
from .fm_layers import (
    ConvK, DepthConvBlock4FM, DepthConvBlockFM, ResBlockFM,
    ResidualBlockUpsampleFM, ResidualBlockWithStrideFM, SubpelConv, UNet2,
    lrelu,
)
from .ops import bilinear_upsample_2x, block_mc, flow_warp
from .spynet import MESpynet


@dataclasses.dataclass(frozen=True)
class DMCFMConfig:
    ch_1x: int = 48
    ch_2x: int = 64
    ch_4x: int = 96
    ch_8x: int = 96
    ch_16x: int = 128
    ch_z: int = 64
    ch_mv: int = 64
    ch_mv_z: int = 64
    qp_num: int = 64
    offset_group: int = 16
    offset_num: int = 2


FM_CONFIG = DMCFMConfig()
TINY_FM_CONFIG = DMCFMConfig(ch_1x=8, ch_2x=8, ch_4x=8, ch_8x=8, ch_16x=8,
                             ch_z=8, ch_mv=8, ch_mv_z=8, qp_num=8,
                             offset_group=2, offset_num=2)


def bilinear_downsample_2x(x):
    """Matches torch F.interpolate(bilinear, align_corners=False)
    downsampling: NO antialias filter (video_net.py:18-23)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h // 2, w // 2, c), method="linear",
                            antialias=False)


def laplace_bits(y, sigma):
    """-log2 P(round) under Laplace(0, sigma) (reference
    get_y_laplace_bits, common_model.py:79-85)."""
    sigma = jnp.clip(sigma.astype(jnp.float32), 1e-5, 1e10)
    y = y.astype(jnp.float32)

    def cdf(v):
        return 0.5 + 0.5 * jnp.sign(v) * (1.0 - jnp.exp(-jnp.abs(v) / sigma))

    probs = cdf(y + 0.5) - cdf(y - 0.5)
    return probs_to_bits(probs)


def get_curr_q(q_anchors, q_index, qp_num):
    """Log-interpolate a quant scalar between (min, max) anchors
    (reference get_one_q_scale, common_model.py:37-42)."""
    min_q, max_q = q_anchors[0], q_anchors[1]
    step = (jnp.log(max_q) - jnp.log(min_q)) / (qp_num - 1)
    return jnp.exp(jnp.log(min_q) + step * q_index)


class OffsetDiversity(nn.Module):
    """Group-based offset/mask warping (reference OffsetDiversity,
    video_model.py:26-63)."""
    cfg: DMCFMConfig
    max_residue_magnitude: float = 40.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, aux_feature, flow):
        c = self.cfg
        g, o = c.offset_group, c.offset_num
        b, h, w, ch = x.shape
        out = ConvK(c.ch_2x, stride=2, dtype=self.dtype, name="conv_offset_0")(aux_feature)
        out = lrelu(out, 0.1)
        out = ConvK(c.ch_2x, dtype=self.dtype, name="conv_offset_1")(out)
        out = lrelu(out, 0.1)
        out = ConvK(3 * g * o, dtype=self.dtype, name="conv_offset_2")(out)
        out = bilinear_upsample_2x(out)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        mask = nn.sigmoid(mask)                        # (B, H, W, g*o)
        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1))        # (B, H, W, 2*g*o)

        # warp unit k = j*g + gi pairs consecutive offset channels
        # (2k, 2k+1) and adds the flow (reference's view(B*g*o, 2, H, W)
        # over cat(o1, o2) + flow.repeat)
        n = g * o
        dx = offset[..., 0::2] + flow[..., 0:1]   # (B, H, W, n)
        dy = offset[..., 1::2] + flow[..., 1:2]

        # x repeated offset_num times then split into g*o units of ch/g
        # channels: unit k = j*g + gi warps feature group gi with field k
        xg = x.reshape(b, h, w, g, ch // g)
        warped = []
        for j in range(o):
            for gi in range(g):
                k = j * g + gi
                f = jnp.stack([dx[..., k], dy[..., k]], -1)
                wv = block_mc(xg[:, :, :, gi], f)
                warped.append(wv * mask[..., k:k + 1])
        # unit-ordered concat = the reference's (B, ch*o, H, W) layout;
        # the grouped 1x1 fusion splits it into g contiguous blocks
        xw = jnp.concatenate(warped, axis=-1)
        xw = xw.reshape(b, h, w, g, o * ch // g)
        fusion = self.param("fusion_kernel", nn.initializers.lecun_normal(),
                            (g, o * ch // g, ch // g), jnp.float32)
        bias = self.param("fusion_bias", nn.initializers.zeros, (ch,),
                          jnp.float32)
        y = jnp.einsum("bhwgi,gio->bhwgo", xw.astype(self.dtype),
                       fusion.astype(self.dtype))
        return y.reshape(b, h, w, ch) + bias.astype(self.dtype)


class FMFeatureExtractor(nn.Module):
    cfg: DMCFMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature):
        c, d = self.cfg, self.dtype
        l1 = ConvK(c.ch_1x, dtype=d, name="conv1")(feature)
        l1 = ResBlockFM(c.ch_1x, dtype=d, name="res_block1")(l1)
        l2 = ConvK(c.ch_2x, stride=2, dtype=d, name="conv2")(l1)
        l2 = ResBlockFM(c.ch_2x, dtype=d, name="res_block2")(l2)
        l3 = ConvK(c.ch_4x, stride=2, dtype=d, name="conv3")(l2)
        l3 = ResBlockFM(c.ch_4x, dtype=d, name="res_block3")(l3)
        return l1, l2, l3


class MultiScaleContextFusion(nn.Module):
    cfg: DMCFMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c1, c2, c3):
        c, d = self.cfg, self.dtype
        c3_up = SubpelConv(c.ch_2x, r=2, kernel=3, dtype=d, name="conv3_up")(c3)
        c3_up = ResBlockFM(c.ch_2x, dtype=d, name="res_block3_up")(c3_up)
        c3_out = ConvK(c.ch_4x, dtype=d, name="conv3_out")(c3)
        c3_out = ResBlockFM(c.ch_4x, dtype=d, name="res_block3_out")(c3_out)
        cat32 = jnp.concatenate([c3_up, c2], axis=-1)
        c2_up = SubpelConv(c.ch_1x, r=2, kernel=3, dtype=d, name="conv2_up")(cat32)
        c2_up = ResBlockFM(c.ch_1x, dtype=d, name="res_block2_up")(c2_up)
        c2_out = ConvK(c.ch_2x, dtype=d, name="conv2_out")(cat32)
        c2_out = ResBlockFM(c.ch_2x, dtype=d, name="res_block2_out")(c2_out)
        c1_out = ConvK(c.ch_1x, dtype=d, name="conv1_out")(
            jnp.concatenate([c2_up, c1], axis=-1))
        c1_out = ResBlockFM(c.ch_1x, dtype=d, name="res_block1_out")(c1_out)
        return c1 + c1_out, c2 + c2_out, c3 + c3_out


class MvEnc(nn.Module):
    cfg: DMCFMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, quant_step):
        ch, d = self.cfg.ch_mv, self.dtype
        out = ResidualBlockWithStrideFM(ch, dtype=d, name="enc_1_0")(x)
        out = DepthConvBlock4FM(ch, dtype=d, name="enc_1_1")(out)
        out = out * quant_step
        out = ResidualBlockWithStrideFM(ch, dtype=d, name="enc_2")(out)
        if context is None:
            out = DepthConvBlock4FM(ch, dtype=d, name="adaptor_0")(out)
        else:
            out = DepthConvBlock4FM(ch, dtype=d, name="adaptor_1")(
                jnp.concatenate([out, context], axis=-1))
        out = ResidualBlockWithStrideFM(ch, dtype=d, name="enc_3_0")(out)
        out = DepthConvBlock4FM(ch, dtype=d, name="enc_3_1")(out)
        return ConvK(ch, stride=2, dtype=d, name="enc_3_2")(out)


class MvDec(nn.Module):
    cfg: DMCFMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, quant_step):
        ch, d = self.cfg.ch_mv, self.dtype
        f = DepthConvBlock4FM(ch, dtype=d, name="dec_1_0")(x)
        f = ResidualBlockUpsampleFM(ch, dtype=d, name="dec_1_1")(f)
        f = DepthConvBlock4FM(ch, dtype=d, name="dec_1_2")(f)
        f = ResidualBlockUpsampleFM(ch, dtype=d, name="dec_1_3")(f)
        feature = DepthConvBlock4FM(ch, dtype=d, name="dec_1_4")(f)
        out = ResidualBlockUpsampleFM(ch, dtype=d, name="dec_2")(feature)
        out = out * quant_step
        out = DepthConvBlock4FM(ch, dtype=d, name="dec_3_0")(out)
        mv = SubpelConv(2, r=2, kernel=1, dtype=d, name="dec_3_1")(out)
        return mv, feature


class ContextualEncoder(nn.Module):
    cfg: DMCFMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c1, c2, c3, quant_step):
        c, d = self.cfg, self.dtype
        f = ConvK(c.ch_2x, stride=2, dtype=d, name="conv1")(
            jnp.concatenate([x, c1], axis=-1))
        f = DepthConvBlock4FM(c.ch_2x * 2, dtype=d, name="res1")(
            jnp.concatenate([f, c2], axis=-1))
        f = f * quant_step
        f = ConvK(c.ch_4x, stride=2, dtype=d, name="conv2")(f)
        f = DepthConvBlock4FM(c.ch_4x * 2, dtype=d, name="res2")(
            jnp.concatenate([f, c3], axis=-1))
        f = ConvK(c.ch_8x, stride=2, dtype=d, name="conv3")(f)
        return ConvK(c.ch_16x, stride=2, dtype=d, name="conv4")(f)


class ContextualDecoder(nn.Module):
    cfg: DMCFMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c2, c3, quant_step):
        c, d = self.cfg, self.dtype
        f = SubpelConv(c.ch_8x, r=2, kernel=3, dtype=d, name="up1")(x)
        f = SubpelConv(c.ch_4x, r=2, kernel=3, dtype=d, name="up2")(f)
        f = DepthConvBlock4FM(c.ch_4x * 2, dtype=d, name="res1")(
            jnp.concatenate([f, c3], axis=-1))
        f = SubpelConv(c.ch_2x, r=2, kernel=3, dtype=d, name="up3")(f)
        f = f * quant_step
        f = DepthConvBlock4FM(c.ch_2x * 2, dtype=d, name="res2")(
            jnp.concatenate([f, c2], axis=-1))
        return SubpelConv(32, r=2, kernel=3, dtype=d, name="up4")(f)


class ReconGeneration(nn.Module):
    cfg: DMCFMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, res, ctx):
        # NOTE the reference calls recon_generation_net(recon_feat, c1)
        # against a forward(ctx, res) signature (video_model.py:379), so
        # the ACTUAL concat order is [recon_feat, context1]
        c, d = self.cfg, self.dtype
        f = ConvK(c.ch_1x, dtype=d, name="first_conv")(
            jnp.concatenate([res, ctx], axis=-1))
        f = UNet2(c.ch_1x, dtype=d, name="unet_1")(f)
        f = UNet2(c.ch_1x, dtype=d, name="unet_2")(f)
        recon = ConvK(3, dtype=d, name="recon_conv")(f)
        return f, recon


class DMCFM(nn.Module):
    """DCVC-FM model (training forward).  dpb dict carries
    {ref_frame, ref_feature, ref_mv_feature, ref_y, ref_mv_y} (reference
    video_model.py:219-270)."""
    cfg: DMCFMConfig = FM_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        d = self.dtype
        self.optic_flow = MESpynet(level_kernels=(7, 7, 5, 5),
                                   dtype=d)
        self.align = OffsetDiversity(c, dtype=d)
        self.mv_encoder = MvEnc(c, dtype=d)
        self.mv_hyper_prior_encoder = nn.Sequential([
            DepthConvBlock4FM(c.ch_mv_z, dtype=d),
            ConvK(c.ch_mv_z, stride=2, dtype=d),
            lambda x: lrelu(x),
            ConvK(c.ch_mv_z, stride=2, dtype=d),
        ])
        self.mv_hyper_prior_decoder = nn.Sequential([
            ResidualBlockUpsampleFM(c.ch_mv_z, dtype=d),
            ResidualBlockUpsampleFM(c.ch_mv_z, dtype=d),
            DepthConvBlock4FM(c.ch_mv, dtype=d),
        ])
        self.mv_y_prior_fusion_adaptor_0 = DepthConvBlockFM(c.ch_mv * 2, dtype=d)
        self.mv_y_prior_fusion_adaptor_1 = DepthConvBlockFM(c.ch_mv * 2, dtype=d)
        self.mv_y_prior_fusion = nn.Sequential([
            DepthConvBlockFM(c.ch_mv * 3, dtype=d),
            DepthConvBlockFM(c.ch_mv * 3, dtype=d),
        ])
        self.mv_y_spatial_prior_adaptor_1 = ConvK(c.ch_mv * 3, kernel=1, dtype=d)
        self.mv_y_spatial_prior_adaptor_2 = ConvK(c.ch_mv * 3, kernel=1, dtype=d)
        self.mv_y_spatial_prior_adaptor_3 = ConvK(c.ch_mv * 3, kernel=1, dtype=d)
        self.mv_y_spatial_prior = nn.Sequential([
            DepthConvBlockFM(c.ch_mv * 3, dtype=d),
            DepthConvBlockFM(c.ch_mv * 3, dtype=d),
            DepthConvBlockFM(c.ch_mv * 2, dtype=d),
        ])
        self.mv_decoder = MvDec(c, dtype=d)

        self.feature_adaptor_I = ConvK(c.ch_1x, dtype=d)
        self.feature_adaptor = [ConvK(c.ch_1x, kernel=1, dtype=d)
                                for _ in range(3)]
        self.feature_extractor = FMFeatureExtractor(c, dtype=d)
        self.context_fusion_net = MultiScaleContextFusion(c, dtype=d)

        self.contextual_encoder = ContextualEncoder(c, dtype=d)
        self.contextual_hyper_prior_encoder = nn.Sequential([
            DepthConvBlock4FM(c.ch_z, dtype=d),
            ConvK(c.ch_z, stride=2, dtype=d),
            lambda x: lrelu(x),
            ConvK(c.ch_z, stride=2, dtype=d),
        ])
        self.contextual_hyper_prior_decoder = nn.Sequential([
            ResidualBlockUpsampleFM(c.ch_z, dtype=d),
            ResidualBlockUpsampleFM(c.ch_z, dtype=d),
            DepthConvBlock4FM(c.ch_16x, dtype=d),
        ])
        self.temporal_prior_encoder = nn.Sequential([
            ConvK(c.ch_8x, stride=2, dtype=d),
            lambda x: lrelu(x, 0.1),
            ConvK(c.ch_16x, stride=2, dtype=d),
        ])
        self.y_prior_fusion_adaptor_0 = DepthConvBlockFM(c.ch_16x * 3, dtype=d)
        self.y_prior_fusion_adaptor_1 = DepthConvBlockFM(c.ch_16x * 3, dtype=d)
        self.y_prior_fusion = nn.Sequential([
            DepthConvBlockFM(c.ch_16x * 3, dtype=d),
            DepthConvBlockFM(c.ch_16x * 3, dtype=d),
        ])
        self.y_spatial_prior_adaptor_1 = ConvK(c.ch_16x * 3, kernel=1, dtype=d)
        self.y_spatial_prior_adaptor_2 = ConvK(c.ch_16x * 3, kernel=1, dtype=d)
        self.y_spatial_prior_adaptor_3 = ConvK(c.ch_16x * 3, kernel=1, dtype=d)
        self.y_spatial_prior = nn.Sequential([
            DepthConvBlockFM(c.ch_16x * 3, dtype=d),
            DepthConvBlockFM(c.ch_16x * 3, dtype=d),
            DepthConvBlockFM(c.ch_16x * 2, dtype=d),
        ])
        self.contextual_decoder = ContextualDecoder(c, dtype=d)
        self.recon_generation_net = ReconGeneration(c, dtype=d)

        ones = nn.initializers.ones
        self.mv_y_q_enc = self.param("mv_y_q_enc", ones, (2, 1, 1, 1))
        self.mv_y_q_dec = self.param("mv_y_q_dec", ones, (2, 1, 1, 1))
        self.y_q_enc = self.param("y_q_enc", ones, (2, 1, 1, 1))
        self.y_q_dec = self.param("y_q_dec", ones, (2, 1, 1, 1))

        self.bit_estimator_z = mcommon.BitEstimatorModule(2, c.ch_z)
        self.bit_estimator_z_mv = mcommon.BitEstimatorModule(2, c.ch_mv_z)

    # ------------------------------------------------------------ helpers

    def _all_q(self, q_index):
        qn = self.cfg.qp_num
        return (get_curr_q(self.mv_y_q_enc, q_index, qn).astype(self.dtype),
                get_curr_q(self.mv_y_q_dec, q_index, qn).astype(self.dtype),
                get_curr_q(self.y_q_enc, q_index, qn).astype(self.dtype),
                get_curr_q(self.y_q_dec, q_index, qn).astype(self.dtype))

    def multi_scale_feature_extractor(self, dpb, fa_idx):
        if dpb["ref_feature"] is None:
            feature = self.feature_adaptor_I(dpb["ref_frame"].astype(self.dtype))
        else:
            feature = self.feature_adaptor[fa_idx](
                dpb["ref_feature"].astype(self.dtype))
        return self.feature_extractor(feature)

    def motion_compensation(self, dpb, mv, fa_idx):
        warpframe = block_mc(dpb["ref_frame"].astype(self.dtype), mv)
        mv2 = bilinear_downsample_2x(mv) / 2
        mv3 = bilinear_downsample_2x(mv2) / 2
        f1, f2, f3 = self.multi_scale_feature_extractor(dpb, fa_idx)
        context1_init = block_mc(f1, mv)
        context1 = self.align(
            f1, jnp.concatenate([context1_init, warpframe,
                                 mv.astype(self.dtype)], axis=-1), mv)
        context2 = block_mc(f2, mv2)
        context3 = block_mc(f3, mv3)
        c1, c2, c3 = self.context_fusion_net(context1, context2, context3)
        return c1, c2, c3, warpframe

    def mv_prior_param_decoder(self, mv_z_hat, dpb):
        p = self.mv_hyper_prior_decoder(mv_z_hat)
        if dpb["ref_mv_y"] is None:
            p = self.mv_y_prior_fusion_adaptor_0(p)
        else:
            p = self.mv_y_prior_fusion_adaptor_1(
                jnp.concatenate([p, dpb["ref_mv_y"].astype(self.dtype)],
                                axis=-1))
        return self.mv_y_prior_fusion(p)

    def contextual_prior_param_decoder(self, z_hat, dpb, context3):
        hierarchical = self.contextual_hyper_prior_decoder(z_hat)
        temporal = self.temporal_prior_encoder(context3)
        if dpb["ref_y"] is None:
            p = self.y_prior_fusion_adaptor_0(
                jnp.concatenate([temporal, hierarchical], axis=-1))
        else:
            p = self.y_prior_fusion_adaptor_1(
                jnp.concatenate([temporal, hierarchical,
                                 dpb["ref_y"].astype(self.dtype)], axis=-1))
        return self.y_prior_fusion(p)

    def _four_part(self, y, params, adaptors, spatial_prior):
        return mcommon.forward_prior_4x_train(
            y, None, None, params, lambda p: p,
            adaptors, spatial_prior, spatial_prior_has_scales=True)

    # ----------------------------------------- inference stage methods
    #
    # Mirrors the reference compress/decompress split
    # (DCVC-FM/src/models/video_model.py:396-500).  Stage granularity
    # follows the UF runtimes: every tensor that influences symbol
    # decisions (priors, means/scales, y_hat accumulation) is computed by
    # programs SHARED between encoder and decoder; encoder-only stages
    # emit integers.

    def _pad4(self, y):
        """Replicate-pad a /16 latent to a multiple of 4 (pad_for_y,
        common_model.py:96-112)."""
        h, w = y.shape[1], y.shape[2]
        pb = (-h) % 4
        pr = (-w) % 4
        if pb or pr:
            y = jnp.pad(y, ((0, 0), (0, pb), (0, pr), (0, 0)), mode="edge")
        return y

    def mv_analysis(self, x, ref_frame, ref_mv_feature, q_index):
        """ENC-only: motion estimation + mv encoding + mv hyper.
        ref_mv_feature None on the first P frame."""
        mv_y_q_enc = get_curr_q(self.mv_y_q_enc, q_index,
                                self.cfg.qp_num).astype(self.dtype)
        est_mv = self.optic_flow(x.astype(self.dtype),
                                 ref_frame.astype(self.dtype))
        mv_y = self.mv_encoder(est_mv, ref_mv_feature, mv_y_q_enc)
        mv_z = self.mv_hyper_prior_encoder(self._pad4(mv_y))
        mv_z_int = jnp.clip(jnp.round(mv_z.astype(jnp.float32)),
                            -30000, 30000).astype(jnp.int16)
        return mv_y.astype(jnp.float32), mv_z_int

    def mv_prior0(self, mv_z_int, ref_mv_y, yh, yw):
        """SHARED: mv hyper decode + fusion -> q/scales/means + spatial
        context (mv_prior_param_decoder, video_model.py:316-325)."""
        p = self.mv_hyper_prior_decoder(mv_z_int.astype(self.dtype))
        p = p[:, :yh, :yw, :]
        if ref_mv_y is None:
            p = self.mv_y_prior_fusion_adaptor_0(p)
        else:
            p = self.mv_y_prior_fusion_adaptor_1(
                jnp.concatenate([p, ref_mv_y.astype(self.dtype)], axis=-1))
        params = self.mv_y_prior_fusion(p)
        q_enc, q_dec, scales, means = mcommon.separate_prior_video_infer(
            params)
        return q_enc, q_dec, scales, means, params

    def mv_prior_step(self, spctx, y_hat_so_far, step):
        adaptors = [self.mv_y_spatial_prior_adaptor_1,
                    self.mv_y_spatial_prior_adaptor_2,
                    self.mv_y_spatial_prior_adaptor_3]
        sp_in = jnp.concatenate([y_hat_so_far.astype(self.dtype), spctx],
                                axis=-1)
        out = self.mv_y_spatial_prior(adaptors[step - 1](sp_in))
        scales, means = jnp.split(out, 2, axis=-1)
        return scales, means

    def mv_synthesis(self, mv_y_hat, q_index):
        """SHARED: mv decode -> (mv_hat, mv_feature)."""
        mv_y_q_dec = get_curr_q(self.mv_y_q_dec, q_index,
                                self.cfg.qp_num).astype(self.dtype)
        return self.mv_decoder(mv_y_hat.astype(self.dtype), mv_y_q_dec)

    def mc(self, ref_frame, ref_feature, fa_idx, mv_hat):
        """SHARED: motion compensation -> (c1, c2, c3)."""
        dpb = {"ref_frame": ref_frame, "ref_feature": ref_feature}
        c1, c2, c3, _ = self.motion_compensation(dpb, mv_hat, fa_idx)
        return c1, c2, c3

    def ctx_analysis(self, x, c1, c2, c3, q_index):
        """ENC-only: contextual encoding + hyper."""
        y_q_enc = get_curr_q(self.y_q_enc, q_index,
                             self.cfg.qp_num).astype(self.dtype)
        y = self.contextual_encoder(x.astype(self.dtype), c1, c2, c3,
                                    y_q_enc)
        z = self.contextual_hyper_prior_encoder(self._pad4(y))
        z_int = jnp.clip(jnp.round(z.astype(jnp.float32)),
                         -30000, 30000).astype(jnp.int16)
        return y.astype(jnp.float32), z_int

    def ctx_prior0(self, z_int, ref_y, c3, yh, yw):
        """SHARED: contextual prior (contextual_prior_param_decoder,
        video_model.py:327-340)."""
        hierarchical = self.contextual_hyper_prior_decoder(
            z_int.astype(self.dtype))
        hierarchical = hierarchical[:, :yh, :yw, :]
        temporal = self.temporal_prior_encoder(c3)
        if ref_y is None:
            p = self.y_prior_fusion_adaptor_0(
                jnp.concatenate([temporal, hierarchical], axis=-1))
        else:
            p = self.y_prior_fusion_adaptor_1(
                jnp.concatenate([temporal, hierarchical,
                                 ref_y.astype(self.dtype)], axis=-1))
        params = self.y_prior_fusion(p)
        q_enc, q_dec, scales, means = mcommon.separate_prior_video_infer(
            params)
        return q_enc, q_dec, scales, means, params

    def ctx_prior_step(self, spctx, y_hat_so_far, step):
        adaptors = [self.y_spatial_prior_adaptor_1,
                    self.y_spatial_prior_adaptor_2,
                    self.y_spatial_prior_adaptor_3]
        sp_in = jnp.concatenate([y_hat_so_far.astype(self.dtype), spctx],
                                axis=-1)
        out = self.y_spatial_prior(adaptors[step - 1](sp_in))
        scales, means = jnp.split(out, 2, axis=-1)
        return scales, means

    def synthesis(self, y_hat, c1, c2, c3, q_index):
        """SHARED: contextual decode + recon -> (x_hat, feature)."""
        y_q_dec = get_curr_q(self.y_q_dec, q_index,
                             self.cfg.qp_num).astype(self.dtype)
        recon_feat = self.contextual_decoder(y_hat.astype(self.dtype),
                                             c2, c3, y_q_dec)
        feature, x_hat = self.recon_generation_net(recon_feat, c1)
        return jnp.clip(x_hat.astype(jnp.float32), 0.0, 1.0), feature

    # ----------------------------------------------------------- forward

    def __call__(self, x, dpb, q_index, fa_idx, rng=None):
        """Training forward for one P frame.  x: (B, H, W, 3) RGB [0, 1].
        rng None -> eval: rate estimates on ROUNDED latents (the
        reference fast no-bitstream mode, test_helper.py:134).

        Returns (result dict, new dpb dict)."""
        mv_y_q_enc, mv_y_q_dec, y_q_enc, y_q_dec = self._all_q(q_index)

        est_mv = self.optic_flow(x.astype(self.dtype),
                                 dpb["ref_frame"].astype(self.dtype))
        ref_mv_feature = dpb["ref_mv_feature"]
        mv_y = self.mv_encoder(est_mv, ref_mv_feature, mv_y_q_enc)

        mv_z = self.mv_hyper_prior_encoder(mv_y)
        mv_z_hat = ste_round(mv_z)
        mv_params = self.mv_prior_param_decoder(mv_z_hat, dpb)
        adaptors_mv = [self.mv_y_spatial_prior_adaptor_1,
                       self.mv_y_spatial_prior_adaptor_2,
                       self.mv_y_spatial_prior_adaptor_3]
        mv_y_res, mv_y_q, mv_y_hat, mv_scales_hat = self._four_part(
            mv_y, mv_params, adaptors_mv, self.mv_y_spatial_prior)

        mv_hat, mv_feature = self.mv_decoder(mv_y_hat, mv_y_q_dec)
        c1, c2, c3, warp_frame = self.motion_compensation(dpb, mv_hat, fa_idx)

        y = self.contextual_encoder(x.astype(self.dtype), c1, c2, c3, y_q_enc)
        z = self.contextual_hyper_prior_encoder(y)
        z_hat = ste_round(z)
        params = self.contextual_prior_param_decoder(z_hat, dpb, c3)
        adaptors_y = [self.y_spatial_prior_adaptor_1,
                      self.y_spatial_prior_adaptor_2,
                      self.y_spatial_prior_adaptor_3]
        y_res, y_q, y_hat, scales_hat = self._four_part(
            y, params, adaptors_y, self.y_spatial_prior)

        recon_feat = self.contextual_decoder(y_hat, c2, c3, y_q_dec)
        feature, x_hat = self.recon_generation_net(recon_feat, c1)
        x_hat = jnp.clip(x_hat.astype(jnp.float32), 0.0, 1.0)

        if rng is not None:
            rngs = jax.random.split(rng, 4)
            y_noisy = mcommon.add_noise(y_res, rngs[0])
            mv_y_noisy = mcommon.add_noise(mv_y_res, rngs[1])
            z_noisy = mcommon.add_noise(z, rngs[2])
            mv_z_noisy = mcommon.add_noise(mv_z, rngs[3])
        else:
            y_noisy, mv_y_noisy = y_q, mv_y_q
            z_noisy, mv_z_noisy = z_hat, mv_z_hat

        bits_y = jnp.sum(laplace_bits(y_noisy, scales_hat), axis=(1, 2, 3))
        bits_mv_y = jnp.sum(laplace_bits(mv_y_noisy, mv_scales_hat),
                            axis=(1, 2, 3))
        bits_z = jnp.sum(mcommon.probs_to_bits(
            self.bit_estimator_z.get_prob(z_noisy, 0)), axis=(1, 2, 3))
        bits_mv_z = jnp.sum(mcommon.probs_to_bits(
            self.bit_estimator_z_mv.get_prob(mv_z_noisy, 0)), axis=(1, 2, 3))

        pixel_num = x.shape[1] * x.shape[2]
        bpp = (bits_y + bits_z + bits_mv_y + bits_mv_z) / pixel_num
        mse = jnp.mean((x_hat - x.astype(jnp.float32)) ** 2, axis=(1, 2, 3))

        new_dpb = {
            "ref_frame": x_hat,
            "ref_feature": feature,
            "ref_mv_feature": mv_feature,
            "ref_y": y_hat,
            "ref_mv_y": mv_y_hat,
        }
        result = {
            "x_hat": x_hat,
            "mse": mse,
            "bpp": bpp,
            "bits_y": bits_y,
            "bits_z": bits_z,
            "bits_mv_y": bits_mv_y,
            "bits_mv_z": bits_mv_z,
            "mv_hat": mv_hat,
            "warp_frame": warp_frame,
        }
        return result, new_dpb
