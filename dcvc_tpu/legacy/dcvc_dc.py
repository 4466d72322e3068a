"""DCVC-DC (CVPR'23) — diverse-context coding.

Reference: DCVC-family/DCVC-DC/src/models/video_model.py.  The direct
predecessor of DCVC-FM: same motion/context/entropy topology
(OffsetDiversity warping, 3-scale fusion, quadtree 4-part prior with
latent-domain conditioning, Laplace rates) with v1 depth-conv blocks,
bottleneck residuals in the contextual transforms, SE-augmented UNet
reconstruction, z at 128ch, a 3-adaptor feature refresh schedule
(index_map [0,1,0,2]), and separate enc/dec q = per-channel basic x
4-anchor scalars (optionally log-interpolated to 64 fine indexes).
First NVC to surpass ECM.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.quant import ste_round
from ..models import common as mcommon
from .dcvc_fm import (
    DMCFMConfig, FMFeatureExtractor, MultiScaleContextFusion,
    OffsetDiversity, bilinear_downsample_2x, laplace_bits,
)
from .dcvc_hem import HEMResBlock, HEMUNet
from .fm_layers import (
    ConvK, DepthConvBlockFM, ResidualBlockUpsampleFM, max_pool_2x,
    ResidualBlockWithStrideFM, SubpelConv, lrelu,
)
from .ops import block_mc
from .spynet import MESpynet

INDEX_MAP = [0, 1, 0, 2]


@dataclasses.dataclass(frozen=True)
class DMCDCConfig:
    ch_1x: int = 48
    ch_2x: int = 64
    ch_4x: int = 96
    ch_8x: int = 96
    ch_16x: int = 128
    ch_mv: int = 64
    ch_n: int = 64
    anchor_num: int = 4
    offset_group: int = 16
    offset_num: int = 2


DC_CONFIG = DMCDCConfig()
TINY_DC_CONFIG = DMCDCConfig(ch_1x=8, ch_2x=8, ch_4x=8, ch_8x=8, ch_16x=8,
                             ch_mv=8, ch_n=8, offset_group=2)


def fine_q_scales(anchors, qp_num=64):
    """Log-interpolate 4 anchors to 64 fine scales (video_model.py:326-341
    uses the first and last anchors as endpoints)."""
    anchors = np.asarray(anchors).reshape(-1)
    return np.exp(np.linspace(np.log(anchors[0]), np.log(anchors[-1]),
                              qp_num))


class DCMvEnc(nn.Module):
    cfg: DMCDCConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, quant_step):
        ch, d = self.cfg.ch_mv, self.dtype
        out = ResidualBlockWithStrideFM(ch, dtype=d, name="enc_1_0")(x)
        out = DepthConvBlockFM(ch, dtype=d, name="enc_1_1")(out)
        out = out * quant_step
        out = ResidualBlockWithStrideFM(ch, dtype=d, name="enc_2")(out)
        if context is None:
            out = DepthConvBlockFM(ch, dtype=d, name="adaptor_0")(out)
        else:
            out = DepthConvBlockFM(ch, dtype=d, name="adaptor_1")(
                jnp.concatenate([out, context], axis=-1))
        out = ResidualBlockWithStrideFM(ch, dtype=d, name="enc_3_0")(out)
        out = DepthConvBlockFM(ch, dtype=d, name="enc_3_1")(out)
        return ConvK(ch, stride=2, dtype=d, name="enc_3_2")(out)


class DCMvDec(nn.Module):
    cfg: DMCDCConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, quant_step):
        ch, d = self.cfg.ch_mv, self.dtype
        f = DepthConvBlockFM(ch, dtype=d, name="dec_1_0")(x)
        f = ResidualBlockUpsampleFM(ch, dtype=d, name="dec_1_1")(f)
        f = DepthConvBlockFM(ch, dtype=d, name="dec_1_2")(f)
        f = ResidualBlockUpsampleFM(ch, dtype=d, name="dec_1_3")(f)
        feature = DepthConvBlockFM(ch, dtype=d, name="dec_1_4")(f)
        out = ResidualBlockUpsampleFM(ch, dtype=d, name="dec_2")(feature)
        out = out * quant_step
        out = DepthConvBlockFM(ch, dtype=d, name="dec_3_0")(out)
        mv = SubpelConv(2, r=2, kernel=1, dtype=d, name="dec_3_1")(out)
        return mv, feature


class DCContextualEncoder(nn.Module):
    cfg: DMCDCConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c1, c2, c3, quant_step):
        c, d = self.cfg, self.dtype

        def bres(ch, name):
            return HEMResBlock(ch, slope=0.1, end_with_relu=True,
                               bottleneck=True, dtype=d, name=name)

        f = ConvK(c.ch_2x, stride=2, dtype=d, name="conv1")(
            jnp.concatenate([x, c1], axis=-1))
        f = bres(c.ch_2x * 2, "res1")(jnp.concatenate([f, c2], axis=-1))
        f = f * quant_step
        f = ConvK(c.ch_4x, stride=2, dtype=d, name="conv2")(f)
        f = bres(c.ch_4x * 2, "res2")(jnp.concatenate([f, c3], axis=-1))
        f = ConvK(c.ch_8x, stride=2, dtype=d, name="conv3")(f)
        return ConvK(c.ch_16x, stride=2, dtype=d, name="conv4")(f)


class DCContextualDecoder(nn.Module):
    cfg: DMCDCConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c2, c3, quant_step):
        c, d = self.cfg, self.dtype

        def bres(ch, name):
            return HEMResBlock(ch, slope=0.1, end_with_relu=True,
                               bottleneck=True, dtype=d, name=name)

        f = SubpelConv(c.ch_8x, r=2, kernel=3, dtype=d, name="up1")(x)
        f = SubpelConv(c.ch_4x, r=2, kernel=3, dtype=d, name="up2")(f)
        f = bres(c.ch_4x * 2, "res1")(jnp.concatenate([f, c3], axis=-1))
        f = SubpelConv(c.ch_2x, r=2, kernel=3, dtype=d, name="up3")(f)
        f = f * quant_step
        f = bres(c.ch_2x * 2, "res2")(jnp.concatenate([f, c2], axis=-1))
        return SubpelConv(32, r=2, kernel=3, dtype=d, name="up4")(f)


class DCUNet(nn.Module):
    """DC's 3-level UNet over DepthConvBlock (ConvFFN flavor) —
    reference UNet, DCVC-DC/src/models/video_net.py:129-171 (unlike
    HEM's SE-augmented UNet and FM's DepthConvBlock4 UNet2)."""
    out_ch: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x1 = DepthConvBlockFM(32, dtype=d, name="conv1")(x)
        x2 = max_pool_2x(x1)
        x2 = DepthConvBlockFM(64, dtype=d, name="conv2")(x2)
        x3 = max_pool_2x(x2)
        x3 = DepthConvBlockFM(128, dtype=d, name="conv3")(x3)
        for i in range(4):
            x3 = DepthConvBlockFM(128, dtype=d,
                                  name=f"context_refine_{i}")(x3)
        u3 = SubpelConv(64, r=2, kernel=1, dtype=d, name="up3")(x3)
        u3 = DepthConvBlockFM(64, dtype=d, name="up_conv3")(
            jnp.concatenate([x2, u3], axis=-1))
        u2 = SubpelConv(32, r=2, kernel=1, dtype=d, name="up2")(u3)
        return DepthConvBlockFM(self.out_ch, dtype=d, name="up_conv2")(
            jnp.concatenate([x1, u2], axis=-1))


class DCReconGeneration(nn.Module):
    cfg: DMCDCConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, res, ctx):
        """Reference ReconGeneration.forward(ctx, res) concatenates
        (ctx, res) (video_model.py:227-232)."""
        c, d = self.cfg, self.dtype
        f = ConvK(c.ch_1x, dtype=d, name="first_conv")(
            jnp.concatenate([ctx, res], axis=-1))
        f = DCUNet(c.ch_1x, dtype=d, name="unet_1")(f)
        f = DCUNet(c.ch_1x, dtype=d, name="unet_2")(f)
        recon = ConvK(3, dtype=d, name="recon_conv")(f)
        return f, recon


class DMCDC(nn.Module):
    """DCVC-DC model (training forward).  dpb dict carries
    {ref_frame, ref_feature, ref_mv_feature, ref_y, ref_mv_y}."""
    cfg: DMCDCConfig = DC_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        d = self.dtype
        # reuse the FM pyramid modules (same channel plan lineage)
        fm_cfg = DMCFMConfig(ch_1x=c.ch_1x, ch_2x=c.ch_2x, ch_4x=c.ch_4x,
                             ch_8x=c.ch_8x, ch_16x=c.ch_16x,
                             offset_group=c.offset_group,
                             offset_num=c.offset_num)
        # DC's MEBasic keeps kernel 7 at every level (video_net.py
        # MEBasic) — the per-level 5x5 reduction is an FM change
        self.optic_flow = MESpynet(dtype=d)
        self.align = OffsetDiversity(fm_cfg, dtype=d)
        self.feature_adaptor_I = ConvK(c.ch_1x, dtype=d)
        self.feature_adaptor = [ConvK(c.ch_1x, kernel=1, dtype=d)
                                for _ in range(3)]
        self.feature_extractor = FMFeatureExtractor(fm_cfg, dtype=d)
        self.context_fusion_net = MultiScaleContextFusion(fm_cfg, dtype=d)

        self.mv_encoder = DCMvEnc(c, dtype=d)
        self.mv_decoder = DCMvDec(c, dtype=d)
        # DC's hyper coders are the HEM-lineage FLAT Sequentials
        # (video_net.py:217-251 get_hyper_enc_dec_models), not FM's
        # RBU/DCB blocks: enc strides (1,1,2,1,2), dec conv/subpel1x1
        # alternation
        self.mv_hyper_prior_encoder = nn.Sequential([
            ConvK(c.ch_n, dtype=d), nn.leaky_relu,
            ConvK(c.ch_n, dtype=d), nn.leaky_relu,
            ConvK(c.ch_n, 3, 2, dtype=d), nn.leaky_relu,
            ConvK(c.ch_n, dtype=d), nn.leaky_relu,
            ConvK(c.ch_n, 3, 2, dtype=d),
        ])
        self.mv_hyper_prior_decoder = nn.Sequential([
            ConvK(c.ch_mv, dtype=d), nn.leaky_relu,
            SubpelConv(c.ch_mv, r=2, kernel=1, dtype=d), nn.leaky_relu,
            ConvK(c.ch_mv, dtype=d), nn.leaky_relu,
            SubpelConv(c.ch_mv, r=2, kernel=1, dtype=d), nn.leaky_relu,
            ConvK(c.ch_mv, dtype=d),
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

        self.contextual_encoder = DCContextualEncoder(c, dtype=d)
        # reduce_enc_layer=True variant (video_net.py:218-225)
        self.contextual_hyper_prior_encoder = nn.Sequential([
            ConvK(c.ch_16x, dtype=d), nn.leaky_relu,
            ConvK(c.ch_16x, 3, 2, dtype=d), nn.leaky_relu,
            ConvK(c.ch_16x, 3, 2, dtype=d),
        ])
        self.contextual_hyper_prior_decoder = nn.Sequential([
            ConvK(c.ch_16x, dtype=d), nn.leaky_relu,
            SubpelConv(c.ch_16x, r=2, kernel=1, dtype=d), nn.leaky_relu,
            ConvK(c.ch_16x, dtype=d), nn.leaky_relu,
            SubpelConv(c.ch_16x, r=2, kernel=1, dtype=d), nn.leaky_relu,
            ConvK(c.ch_16x, dtype=d),
        ])
        self.temporal_prior_encoder = nn.Sequential([
            ConvK(c.ch_8x, 3, 2, dtype=d), lambda x: lrelu(x, 0.1),
            ConvK(c.ch_16x, 3, 2, dtype=d),
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
        self.contextual_decoder = DCContextualDecoder(c, dtype=d)
        self.recon_generation_net = DCReconGeneration(c, dtype=d)

        ones = nn.initializers.ones
        self.mv_y_q_basic_enc = self.param("mv_y_q_basic_enc", ones,
                                           (1, 1, 1, c.ch_mv))
        self.mv_y_q_scale_enc = self.param("mv_y_q_scale_enc", ones,
                                           (c.anchor_num, 1, 1, 1))
        self.mv_y_q_basic_dec = self.param("mv_y_q_basic_dec", ones,
                                           (1, 1, 1, c.ch_mv))
        self.mv_y_q_scale_dec = self.param("mv_y_q_scale_dec", ones,
                                           (c.anchor_num, 1, 1, 1))
        self.y_q_basic_enc = self.param("y_q_basic_enc", ones,
                                        (1, 1, 1, c.ch_2x * 2))
        self.y_q_scale_enc = self.param("y_q_scale_enc", ones,
                                        (c.anchor_num, 1, 1, 1))
        self.y_q_basic_dec = self.param("y_q_basic_dec", ones,
                                        (1, 1, 1, c.ch_2x))
        self.y_q_scale_dec = self.param("y_q_scale_dec", ones,
                                        (c.anchor_num, 1, 1, 1))

        self.bit_estimator_z = mcommon.BitEstimatorModule(1, c.ch_16x)
        self.bit_estimator_z_mv = mcommon.BitEstimatorModule(1, c.ch_n)

    # ------------------------------------------------------------ helpers

    def _q(self, basic, scale_anchors, q_index):
        return (basic * scale_anchors[q_index]).astype(self.dtype)

    def motion_compensation(self, dpb, mv, frame_idx):
        ref = dpb["ref_frame"].astype(self.dtype)
        warpframe = block_mc(ref, mv)
        mv2 = bilinear_downsample_2x(mv) / 2
        mv3 = bilinear_downsample_2x(mv2) / 2
        if dpb["ref_feature"] is None:
            feature = self.feature_adaptor_I(ref)
        else:
            feature = self.feature_adaptor[INDEX_MAP[frame_idx % 4]](
                dpb["ref_feature"].astype(self.dtype))
        f1, f2, f3 = self.feature_extractor(feature)
        context1_init = block_mc(f1, mv)
        context1 = self.align(
            f1, jnp.concatenate([context1_init, warpframe,
                                 mv.astype(self.dtype)], axis=-1), mv)
        context2 = block_mc(f2, mv2)
        context3 = block_mc(f3, mv3)
        c1, c2, c3 = self.context_fusion_net(context1, context2, context3)
        return c1, c2, c3, warpframe

    def _four_part(self, y, params, adaptors, spatial_prior):
        return mcommon.forward_prior_4x_train(
            y, None, None, params, lambda p: p,
            adaptors, spatial_prior, spatial_prior_has_scales=True)

    # ----------------------------------------- inference stage methods
    #
    # FM-compatible signatures (runtime/fm_codec.py base class); reference
    # DCVC-DC/src/models/video_model.py:425-520.  q_index is traced over
    # the 64-level fine interpolation of the 4 ckpt anchors (q_in_ckpt
    # selects the anchors directly).

    def _q_infer(self, basic, anchors, q_index, q_in_ckpt):
        a = anchors.reshape(-1)
        if q_in_ckpt:
            scale = a[q_index]
        else:
            step = (jnp.log(a[-1]) - jnp.log(a[0])) / (64 - 1)
            scale = jnp.exp(jnp.log(a[0]) + step * q_index)
        return (basic * scale).astype(self.dtype)

    def _pad4(self, y):
        h, w = y.shape[1], y.shape[2]
        pb, pr = (-h) % 4, (-w) % 4
        if pb or pr:
            y = jnp.pad(y, ((0, 0), (0, pb), (0, pr), (0, 0)), mode="edge")
        return y

    def mv_analysis(self, x, ref_frame, ref_mv_feature, q_index,
                    q_in_ckpt=False):
        q = self._q_infer(self.mv_y_q_basic_enc, self.mv_y_q_scale_enc,
                          q_index, q_in_ckpt)
        est_mv = self.optic_flow(x.astype(self.dtype),
                                 ref_frame.astype(self.dtype))
        mv_y = self.mv_encoder(est_mv, ref_mv_feature, q)
        mv_z = self.mv_hyper_prior_encoder(self._pad4(mv_y))
        mv_z_int = jnp.clip(jnp.round(mv_z.astype(jnp.float32)),
                            -30000, 30000).astype(jnp.int16)
        return mv_y.astype(jnp.float32), mv_z_int

    def mv_prior0(self, mv_z_int, ref_mv_y, yh, yw):
        p = self.mv_hyper_prior_decoder(mv_z_int.astype(self.dtype))
        p = p[:, :yh, :yw, :]
        if ref_mv_y is None:
            p = self.mv_y_prior_fusion_adaptor_0(p)
        else:
            p = self.mv_y_prior_fusion_adaptor_1(jnp.concatenate(
                [p, ref_mv_y.astype(self.dtype)], axis=-1))
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

    def mv_synthesis(self, mv_y_hat, q_index, q_in_ckpt=False):
        q = self._q_infer(self.mv_y_q_basic_dec, self.mv_y_q_scale_dec,
                          q_index, q_in_ckpt)
        return self.mv_decoder(mv_y_hat.astype(self.dtype), q)

    def mc(self, ref_frame, ref_feature, fa_idx, mv_hat):
        """fa_idx: adaptor index (caller maps INDEX_MAP[frame_idx % 4])."""
        ref = ref_frame.astype(self.dtype)
        warpframe = block_mc(ref, mv_hat)
        mv2 = bilinear_downsample_2x(mv_hat) / 2
        mv3 = bilinear_downsample_2x(mv2) / 2
        if ref_feature is None:
            feature = self.feature_adaptor_I(ref)
        else:
            feature = self.feature_adaptor[fa_idx](
                ref_feature.astype(self.dtype))
        f1, f2, f3 = self.feature_extractor(feature)
        context1_init = block_mc(f1, mv_hat)
        context1 = self.align(
            f1, jnp.concatenate([context1_init, warpframe,
                                 mv_hat.astype(self.dtype)], axis=-1),
            mv_hat)
        context2 = block_mc(f2, mv2)
        context3 = block_mc(f3, mv3)
        return self.context_fusion_net(context1, context2, context3)

    def ctx_analysis(self, x, c1, c2, c3, q_index, q_in_ckpt=False):
        q = self._q_infer(self.y_q_basic_enc, self.y_q_scale_enc,
                          q_index, q_in_ckpt)
        y = self.contextual_encoder(x.astype(self.dtype), c1, c2, c3, q)
        z = self.contextual_hyper_prior_encoder(self._pad4(y))
        z_int = jnp.clip(jnp.round(z.astype(jnp.float32)),
                         -30000, 30000).astype(jnp.int16)
        return y.astype(jnp.float32), z_int

    def ctx_prior0(self, z_int, ref_y, c3, yh, yw):
        hierarchical = self.contextual_hyper_prior_decoder(
            z_int.astype(self.dtype))
        hierarchical = hierarchical[:, :yh, :yw, :]
        temporal = self.temporal_prior_encoder(c3)
        if ref_y is None:
            p = self.y_prior_fusion_adaptor_0(
                jnp.concatenate([temporal, hierarchical], axis=-1))
        else:
            p = self.y_prior_fusion_adaptor_1(jnp.concatenate(
                [temporal, hierarchical, ref_y.astype(self.dtype)],
                axis=-1))
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

    def synthesis(self, y_hat, c1, c2, c3, q_index, q_in_ckpt=False):
        q = self._q_infer(self.y_q_basic_dec, self.y_q_scale_dec,
                          q_index, q_in_ckpt)
        recon_feat = self.contextual_decoder(y_hat.astype(self.dtype),
                                             c2, c3, q)
        feature, x_hat = self.recon_generation_net(recon_feat, c1)
        return jnp.clip(x_hat.astype(jnp.float32), 0.0, 1.0), feature

    # ----------------------------------------------------------- forward

    def __call__(self, x, dpb, q_index, frame_idx, rng=None):
        """Training forward.  x: (B, H, W, 3) RGB [0, 1]; q_index selects
        the anchor (0..anchor_num-1).  rng None -> eval (rounded rate
        estimates, reference forward_one_frame eval path)."""
        mv_y_q_enc = self._q(self.mv_y_q_basic_enc, self.mv_y_q_scale_enc,
                             q_index)
        mv_y_q_dec = self._q(self.mv_y_q_basic_dec, self.mv_y_q_scale_dec,
                             q_index)
        y_q_enc = self._q(self.y_q_basic_enc, self.y_q_scale_enc, q_index)
        y_q_dec = self._q(self.y_q_basic_dec, self.y_q_scale_dec, q_index)

        est_mv = self.optic_flow(x.astype(self.dtype),
                                 dpb["ref_frame"].astype(self.dtype))
        mv_y = self.mv_encoder(est_mv, dpb["ref_mv_feature"], mv_y_q_enc)
        mv_z = self.mv_hyper_prior_encoder(mv_y)
        mv_z_hat = ste_round(mv_z)
        mv_params = self.mv_hyper_prior_decoder(mv_z_hat)
        if dpb["ref_mv_y"] is None:
            mv_params = self.mv_y_prior_fusion_adaptor_0(mv_params)
        else:
            mv_params = self.mv_y_prior_fusion_adaptor_1(jnp.concatenate(
                [mv_params, dpb["ref_mv_y"].astype(self.dtype)], axis=-1))
        mv_params = self.mv_y_prior_fusion(mv_params)
        adaptors_mv = [self.mv_y_spatial_prior_adaptor_1,
                       self.mv_y_spatial_prior_adaptor_2,
                       self.mv_y_spatial_prior_adaptor_3]
        mv_y_res, mv_y_q, mv_y_hat, mv_scales_hat = self._four_part(
            mv_y, mv_params, adaptors_mv, self.mv_y_spatial_prior)

        mv_hat, mv_feature = self.mv_decoder(mv_y_hat, mv_y_q_dec)
        c1, c2, c3, warp_frame = self.motion_compensation(dpb, mv_hat,
                                                          frame_idx)

        y = self.contextual_encoder(x.astype(self.dtype), c1, c2, c3,
                                    y_q_enc)
        z = self.contextual_hyper_prior_encoder(y)
        z_hat = ste_round(z)
        hierarchical = self.contextual_hyper_prior_decoder(z_hat)
        temporal = self.temporal_prior_encoder(c3)
        if dpb["ref_y"] is None:
            params = self.y_prior_fusion_adaptor_0(
                jnp.concatenate([temporal, hierarchical], axis=-1))
        else:
            params = self.y_prior_fusion_adaptor_1(jnp.concatenate(
                [temporal, hierarchical, dpb["ref_y"].astype(self.dtype)],
                axis=-1))
        params = self.y_prior_fusion(params)
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

        pixel_num = x.shape[1] * x.shape[2]
        bpp_y = jnp.sum(laplace_bits(y_noisy, scales_hat),
                        axis=(1, 2, 3)) / pixel_num
        bpp_mv_y = jnp.sum(laplace_bits(mv_y_noisy, mv_scales_hat),
                           axis=(1, 2, 3)) / pixel_num
        bpp_z = jnp.sum(mcommon.probs_to_bits(
            self.bit_estimator_z.get_prob(z_noisy, 0)),
            axis=(1, 2, 3)) / pixel_num
        bpp_mv_z = jnp.sum(mcommon.probs_to_bits(
            self.bit_estimator_z_mv.get_prob(mv_z_noisy, 0)),
            axis=(1, 2, 3)) / pixel_num

        mse = jnp.mean((x_hat - x.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
        return {
            "bpp_y": bpp_y, "bpp_z": bpp_z,
            "bpp_mv_y": bpp_mv_y, "bpp_mv_z": bpp_mv_z,
            "bpp": bpp_y + bpp_z + bpp_mv_y + bpp_mv_z,
            "mse": mse,
            "x_hat": x_hat,
            "warp_frame": warp_frame,
            "dpb": {
                "ref_frame": x_hat,
                "ref_feature": feature,
                "ref_mv_feature": mv_feature,
                "ref_y": y_hat,
                "ref_mv_y": mv_y_hat,
            },
        }
