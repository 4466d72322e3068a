"""DCVC-HEM (MM'22) — hybrid spatial-temporal entropy model.

Reference: DCVC-family/DCVC-HEM/src/models/video_model.py.  Latent-domain
propagation (ref_y / ref_mv_y condition the priors), dual 2-part
checkerboard spatial prior, single-model rate adjustment via
lower-bounded q_basic vectors x 4 scalar anchors, SE-augmented UNet
reconstruction.  First NVC to beat H.266/VTM.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.masks import _phase_np
from ..core.quant import ste_round, lower_bound
from ..core.shuffle import pixel_shuffle
from ..models import common as mcommon
from .dcvc_fm import bilinear_downsample_2x, laplace_bits
from .fm_layers import (
    ConvK, ResBlockFM, ResidualBlockUpsampleFM, ResidualBlockWithStrideFM,
    SubpelConv, lrelu, max_pool_2x,
)
from .ops import flow_warp
from .spynet import MESpynet


@dataclasses.dataclass(frozen=True)
class DMCHEMConfig:
    ch_mv: int = 64
    ch_n: int = 64
    ch_m: int = 96
    anchor_num: int = 4


HEM_CONFIG = DMCHEMConfig()
TINY_HEM_CONFIG = DMCHEMConfig(ch_mv=8, ch_n=8, ch_m=8)


class HEMResBlock(nn.Module):
    """video_net ResBlock with slope/start/end/bottleneck options."""
    channel: int
    slope: float = 0.01
    start_from_relu: bool = True
    end_with_relu: bool = False
    bottleneck: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def act(v):
            if self.slope < 1e-4:
                return nn.relu(v)
            return lrelu(v, self.slope)
        inner = self.channel // 2 if self.bottleneck else self.channel
        h = act(x) if self.start_from_relu else x
        h = ConvK(inner, dtype=self.dtype, name="conv1")(h)
        h = act(h)
        h = ConvK(self.channel, dtype=self.dtype, name="conv2")(h)
        if self.end_with_relu:
            h = act(h)
        return x + h


class SELayer(nn.Module):
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(max(ch // self.reduction, 1), use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(ch, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class ConvBlockResidual(nn.Module):
    out_ch: int
    se_layer: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvK(self.out_ch, dtype=self.dtype, name="conv1")(x)
        h = lrelu(h, 0.01)
        h = ConvK(self.out_ch, dtype=self.dtype, name="conv2")(h)
        if self.se_layer:
            h = SELayer(dtype=self.dtype, name="se")(h)
        return h + ConvK(self.out_ch, kernel=1, dtype=self.dtype,
                         name="up_dim")(x)


class HEMUNet(nn.Module):
    out_ch: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x1 = ConvBlockResidual(32, dtype=d, name="conv1")(x)
        x2 = max_pool_2x(x1)
        x2 = ConvBlockResidual(64, dtype=d, name="conv2")(x2)
        x3 = max_pool_2x(x2)
        x3 = ConvBlockResidual(128, dtype=d, name="conv3")(x3)
        for i in range(4):
            x3 = HEMResBlock(128, slope=0.0, dtype=d,
                             name=f"context_refine_{i}")(x3)
        u3 = SubpelConv(64, r=2, kernel=1, dtype=d, name="up3")(x3)
        u3 = ConvBlockResidual(64, dtype=d, name="up_conv3")(
            jnp.concatenate([x2, u3], axis=-1))
        u2 = SubpelConv(32, r=2, kernel=1, dtype=d, name="up2")(u3)
        return ConvBlockResidual(self.out_ch, dtype=d, name="up_conv2")(
            jnp.concatenate([x1, u2], axis=-1))


class DMCHEM(nn.Module):
    """DCVC-HEM P-frame model (training forward).  dpb:
    {ref_frame, ref_feature, ref_y, ref_mv_y} (None -> zeros, as the
    reference substitutes, video_model.py:424-427, 443-446)."""
    cfg: DMCHEMConfig = HEM_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c, d = self.cfg, self.dtype
        MV, N, M = c.ch_mv, c.ch_n, c.ch_m

        self.optic_flow = MESpynet(dtype=d)

        # HEM's enc/dec ResidualBlock is conv->lrelu->conv->lrelu(+id)
        # (layers.py:75-99 via get_enc_dec_models, video_net.py:226-248)
        # — NOT FM's lrelu-first ResBlock
        def hem_res():
            return HEMResBlock(MV, start_from_relu=False,
                               end_with_relu=True, dtype=d)

        self.mv_encoder = nn.Sequential([
            ResidualBlockWithStrideFM(MV, dtype=d), hem_res(),
            ResidualBlockWithStrideFM(MV, dtype=d), hem_res(),
            ResidualBlockWithStrideFM(MV, dtype=d), hem_res(),
            ConvK(MV, stride=2, dtype=d),
        ])
        self.mv_decoder = nn.Sequential([
            hem_res(), ResidualBlockUpsampleFM(MV, dtype=d),
            hem_res(), ResidualBlockUpsampleFM(MV, dtype=d),
            hem_res(), ResidualBlockUpsampleFM(MV, dtype=d),
            hem_res(), SubpelConv(2, r=2, kernel=1, dtype=d),
        ])
        self.mv_hyper_prior_encoder = nn.Sequential([
            ConvK(N, dtype=d), lambda x: lrelu(x),
            ConvK(N, dtype=d), lambda x: lrelu(x),
            ConvK(N, stride=2, dtype=d), lambda x: lrelu(x),
            ConvK(N, dtype=d), lambda x: lrelu(x),
            ConvK(N, stride=2, dtype=d),
        ])
        self.mv_hyper_prior_decoder = nn.Sequential([
            ConvK(MV, dtype=d), lambda x: lrelu(x),
            SubpelConv(MV, r=2, kernel=1, dtype=d), lambda x: lrelu(x),
            ConvK(MV * 3 // 2, dtype=d), lambda x: lrelu(x),
            SubpelConv(MV * 3 // 2, r=2, kernel=1, dtype=d),
            lambda x: lrelu(x),
            ConvK(MV * 2, dtype=d),
        ])
        self.mv_y_prior_fusion = nn.Sequential([
            ConvK(MV * 3, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(MV * 3, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(MV * 3, dtype=d),
        ])
        self.mv_y_spatial_prior = nn.Sequential([
            ConvK(MV * 3, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(MV * 3, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(MV * 2, dtype=d),
        ])

        self.feature_adaptor_I = ConvK(N, dtype=d)
        self.feature_adaptor_P = ConvK(N, kernel=1, dtype=d)

        # 3-scale single-channel-count pyramid (video_model.py:17-68)
        self.fx_conv1 = ConvK(N, dtype=d)
        self.fx_res1 = ResBlockFM(N, dtype=d)
        self.fx_conv2 = ConvK(N, stride=2, dtype=d)
        self.fx_res2 = ResBlockFM(N, dtype=d)
        self.fx_conv3 = ConvK(N, stride=2, dtype=d)
        self.fx_res3 = ResBlockFM(N, dtype=d)

        self.cf_conv3_up = SubpelConv(N, r=2, kernel=3, dtype=d)
        self.cf_res3_up = ResBlockFM(N, dtype=d)
        self.cf_conv3_out = ConvK(N, dtype=d)
        self.cf_res3_out = ResBlockFM(N, dtype=d)
        self.cf_conv2_up = SubpelConv(N, r=2, kernel=3, dtype=d)
        self.cf_res2_up = ResBlockFM(N, dtype=d)
        self.cf_conv2_out = ConvK(N, dtype=d)
        self.cf_res2_out = ResBlockFM(N, dtype=d)
        self.cf_conv1_out = ConvK(N, dtype=d)
        self.cf_res1_out = ResBlockFM(N, dtype=d)

        def bottleneck_res(ch):
            # HEM flips start_from_relu to True vs TCM's False
            # (video_model.py:75-80 vs TCM video_net_dmc.py res blocks)
            return HEMResBlock(ch, slope=0.1, start_from_relu=True,
                               end_with_relu=True, bottleneck=True, dtype=d)

        self.ce_conv1 = ConvK(N, stride=2, dtype=d)
        self.ce_res1 = bottleneck_res(N * 2)
        self.ce_conv2 = ConvK(N, stride=2, dtype=d)
        self.ce_res2 = bottleneck_res(N * 2)
        self.ce_conv3 = ConvK(N, stride=2, dtype=d)
        self.ce_conv4 = ConvK(M, stride=2, dtype=d)

        self.cd_up1 = SubpelConv(N, r=2, kernel=3, dtype=d)
        self.cd_up2 = SubpelConv(N, r=2, kernel=3, dtype=d)
        self.cd_res1 = bottleneck_res(N * 2)
        self.cd_up3 = SubpelConv(N, r=2, kernel=3, dtype=d)
        self.cd_res2 = bottleneck_res(N * 2)
        self.cd_up4 = SubpelConv(32, r=2, kernel=3, dtype=d)

        self.contextual_hyper_prior_encoder = nn.Sequential([
            ConvK(N, dtype=d), lambda x: lrelu(x),
            ConvK(N, stride=2, dtype=d), lambda x: lrelu(x),
            ConvK(N, stride=2, dtype=d),
        ])
        self.contextual_hyper_prior_decoder = nn.Sequential([
            ConvK(M, dtype=d), lambda x: lrelu(x),
            SubpelConv(M, r=2, kernel=1, dtype=d), lambda x: lrelu(x),
            ConvK(M * 3 // 2, dtype=d), lambda x: lrelu(x),
            SubpelConv(M * 3 // 2, r=2, kernel=1, dtype=d),
            lambda x: lrelu(x),
            ConvK(M * 2, dtype=d),
        ])
        self.temporal_prior_encoder = nn.Sequential([
            ConvK(M * 3 // 2, stride=2, dtype=d), lambda x: lrelu(x, 0.1),
            ConvK(M * 2, stride=2, dtype=d),
        ])
        self.y_prior_fusion = nn.Sequential([
            ConvK(M * 4, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(M * 3, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(M * 3, dtype=d),
        ])
        self.y_spatial_prior = nn.Sequential([
            ConvK(M * 3, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(M * 3, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(M * 2, dtype=d),
        ])

        self.rg_first_conv = ConvK(N, dtype=d)
        self.rg_unet_1 = HEMUNet(N, dtype=d)
        self.rg_unet_2 = HEMUNet(N, dtype=d)
        self.rg_recon_conv = ConvK(3, dtype=d)

        ones = nn.initializers.ones
        self.mv_y_q_basic = self.param("mv_y_q_basic", ones, (1, 1, 1, MV))
        self.mv_y_q_scale = self.param("mv_y_q_scale", ones,
                                       (c.anchor_num, 1, 1, 1))
        self.y_q_basic = self.param("y_q_basic", ones, (1, 1, 1, M))
        self.y_q_scale = self.param("y_q_scale", ones,
                                    (c.anchor_num, 1, 1, 1))

        self.bit_estimator_z = mcommon.BitEstimatorModule(1, N)
        self.bit_estimator_z_mv = mcommon.BitEstimatorModule(1, N)

    # ----------------------------------------------------------- helpers

    def feature_extractor(self, feature):
        l1 = self.fx_res1(self.fx_conv1(feature))
        l2 = self.fx_res2(self.fx_conv2(l1))
        l3 = self.fx_res3(self.fx_conv3(l2))
        return l1, l2, l3

    def context_fusion(self, c1, c2, c3):
        c3_up = self.cf_res3_up(self.cf_conv3_up(c3))
        c3_out = self.cf_res3_out(self.cf_conv3_out(c3))
        cat32 = jnp.concatenate([c3_up, c2], axis=-1)
        c2_up = self.cf_res2_up(self.cf_conv2_up(cat32))
        c2_out = self.cf_res2_out(self.cf_conv2_out(cat32))
        c1_out = self.cf_res1_out(self.cf_conv1_out(
            jnp.concatenate([c2_up, c1], axis=-1)))
        return c1 + c1_out, c2 + c2_out, c3 + c3_out

    def motion_compensation(self, dpb, mv):
        ref = dpb["ref_frame"].astype(self.dtype)
        warpframe = flow_warp(ref, mv)
        mv2 = bilinear_downsample_2x(mv) / 2
        mv3 = bilinear_downsample_2x(mv2) / 2
        if dpb["ref_feature"] is None:
            feature = self.feature_adaptor_I(ref)
        else:
            feature = self.feature_adaptor_P(
                dpb["ref_feature"].astype(self.dtype))
        f1, f2, f3 = self.feature_extractor(feature)
        c1 = flow_warp(f1, mv)
        c2 = flow_warp(f2, mv2)
        c3 = flow_warp(f3, mv3)
        c1, c2, c3 = self.context_fusion(c1, c2, c3)
        return c1, c2, c3, warpframe

    def contextual_encoder(self, x, c1, c2, c3):
        f = self.ce_conv1(jnp.concatenate([x, c1], axis=-1))
        f = self.ce_res1(jnp.concatenate([f, c2], axis=-1))
        f = self.ce_conv2(f)
        f = self.ce_res2(jnp.concatenate([f, c3], axis=-1))
        return self.ce_conv4(self.ce_conv3(f))

    def contextual_decoder(self, y_hat, c2, c3):
        f = self.cd_up2(self.cd_up1(y_hat))
        f = self.cd_res1(jnp.concatenate([f, c3], axis=-1))
        f = self.cd_up3(f)
        f = self.cd_res2(jnp.concatenate([f, c2], axis=-1))
        return self.cd_up4(f)

    def forward_dual_prior(self, y, means, scales, quant_step, spatial_prior):
        """2-pass cross-checkerboard prior (HEM common_model.py:102-145)."""
        b, h, w, cc = y.shape
        mask_0 = (_phase_np(h, w, 0, 0) | _phase_np(h, w, 1, 1))[None, :, :, None]
        mask_1 = ~mask_0

        quant_step = lower_bound(quant_step, 0.5)
        y = y / quant_step
        y_0, y_1 = jnp.split(y, 2, axis=-1)
        scales_0, scales_1 = jnp.split(scales, 2, axis=-1)
        means_0, means_1 = jnp.split(means, 2, axis=-1)

        r00, q00, h00, s00 = mcommon.process_with_mask_train(
            y_0, scales_0, means_0, mask_0)
        r11, q11, h11, s11 = mcommon.process_with_mask_train(
            y_1, scales_1, means_1, mask_1)

        params = jnp.concatenate([h00, h11, means, scales,
                                  jnp.broadcast_to(quant_step, y.shape)
                                  .astype(y.dtype)], axis=-1)
        out = spatial_prior(params)
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
    #
    # Reference compress/decompress (video_model.py:259-372).  Shared
    # enc/dec stage programs; curr q vectors are q_basic (lower-bounded)
    # x a traced scalar q_scale.

    def _curr_q(self, basic, scale):
        return (lower_bound(basic, 0.5) * scale).astype(self.dtype)

    def mv_analysis(self, x, ref_frame, mv_y_q_scale):
        """ENC-only: flow + mv encode + mv hyper."""
        est_mv = self.optic_flow(x.astype(self.dtype),
                                 ref_frame.astype(self.dtype))
        mv_y = self.mv_encoder(est_mv) / self._curr_q(self.mv_y_q_basic,
                                                      mv_y_q_scale)
        mv_z = self.mv_hyper_prior_encoder(mv_y)
        mv_z_int = jnp.clip(jnp.round(mv_z.astype(jnp.float32)),
                            -30000, 30000).astype(jnp.int16)
        return mv_y.astype(jnp.float32), mv_z_int

    def mv_prior(self, mv_z_int, ref_mv_y):
        """SHARED: mv hyper decode + fusion.  ref_mv_y: zeros tensor when
        the DPB has none (video_model.py:271-276)."""
        p = self.mv_hyper_prior_decoder(mv_z_int.astype(self.dtype))
        p = jnp.concatenate([p, ref_mv_y.astype(self.dtype)], axis=-1)
        q_step, scales, means = jnp.split(self.mv_y_prior_fusion(p), 3,
                                          axis=-1)
        return lower_bound(q_step, 0.5), scales, means

    def mv_spatial(self, y_hat_0_merged, q_step, scales, means):
        """SHARED: second checkerboard pass params
        (common_model.py:125-127)."""
        params = jnp.concatenate(
            [y_hat_0_merged.astype(self.dtype), means, scales,
             jnp.broadcast_to(q_step, y_hat_0_merged.shape).astype(self.dtype)],
            axis=-1)
        out = self.mv_y_spatial_prior(params)
        s0, m0, s1, m1 = jnp.split(out, 4, axis=-1)
        return (jnp.concatenate([s0, s1], axis=-1),
                jnp.concatenate([m0, m1], axis=-1))

    def mv_synthesis(self, mv_y_hat, mv_y_q_scale):
        mv_y_hat = mv_y_hat * self._curr_q(self.mv_y_q_basic,
                                           mv_y_q_scale).astype(jnp.float32)
        mv_hat = self.mv_decoder(mv_y_hat.astype(self.dtype))
        return mv_y_hat, mv_hat

    def mc(self, ref_frame, ref_feature, has_feature, mv_hat):
        dpb = {"ref_frame": ref_frame,
               "ref_feature": ref_feature if has_feature else None}
        c1, c2, c3, _ = self.motion_compensation(dpb, mv_hat)
        return c1, c2, c3

    def ctx_analysis(self, x, c1, c2, c3, y_q_scale):
        y = self.contextual_encoder(x.astype(self.dtype), c1, c2, c3) \
            / self._curr_q(self.y_q_basic, y_q_scale)
        z = self.contextual_hyper_prior_encoder(y)
        z_int = jnp.clip(jnp.round(z.astype(jnp.float32)),
                         -30000, 30000).astype(jnp.int16)
        return y.astype(jnp.float32), z_int

    def ctx_prior(self, z_int, c3, ref_y):
        hierarchical = self.contextual_hyper_prior_decoder(
            z_int.astype(self.dtype))
        temporal = self.temporal_prior_encoder(c3)
        p = jnp.concatenate([temporal, hierarchical,
                             ref_y.astype(self.dtype)], axis=-1)
        q_step, scales, means = jnp.split(self.y_prior_fusion(p), 3,
                                          axis=-1)
        return lower_bound(q_step, 0.5), scales, means

    def ctx_spatial(self, y_hat_0_merged, q_step, scales, means):
        params = jnp.concatenate(
            [y_hat_0_merged.astype(self.dtype), means, scales,
             jnp.broadcast_to(q_step, y_hat_0_merged.shape).astype(self.dtype)],
            axis=-1)
        out = self.y_spatial_prior(params)
        s0, m0, s1, m1 = jnp.split(out, 4, axis=-1)
        return (jnp.concatenate([s0, s1], axis=-1),
                jnp.concatenate([m0, m1], axis=-1))

    def synthesis(self, y_hat, c1, c2, c3, y_q_scale):
        y_hat = y_hat * self._curr_q(self.y_q_basic,
                                     y_q_scale).astype(jnp.float32)
        recon_feat = self.contextual_decoder(y_hat.astype(self.dtype),
                                             c2, c3)
        # reference arg-order swap: actual concat = [recon_feat, c1]
        feature = self.rg_first_conv(
            jnp.concatenate([recon_feat, c1], axis=-1))
        feature = self.rg_unet_2(self.rg_unet_1(feature))
        recon = jnp.clip(self.rg_recon_conv(feature).astype(jnp.float32),
                         0.0, 1.0)
        return y_hat, recon, feature

    # ----------------------------------------------------------- forward

    def __call__(self, x, dpb, mv_y_q_scale=None, y_q_scale=None, rng=None):
        """Training forward (video_model.py:413-...).  x: (B, H, W, 3)
        RGB [0, 1].  Returns (result dict incl. new dpb)."""
        d = self.dtype
        if mv_y_q_scale is None:
            mv_y_q_scale = self.mv_y_q_scale[0, 0, 0, 0]
        if y_q_scale is None:
            y_q_scale = self.y_q_scale[0, 0, 0, 0]
        curr_mv_q = (lower_bound(self.mv_y_q_basic, 0.5)
                     * mv_y_q_scale).astype(d)
        curr_y_q = (lower_bound(self.y_q_basic, 0.5) * y_q_scale).astype(d)
        noise_quant = rng is not None

        x = x.astype(d)
        ref = dpb["ref_frame"].astype(d)

        est_mv = self.optic_flow(x, ref)
        mv_y = self.mv_encoder(est_mv) / curr_mv_q
        mv_z = self.mv_hyper_prior_encoder(mv_y)
        mv_z_hat = ste_round(mv_z)
        mv_params = self.mv_hyper_prior_decoder(mv_z_hat)
        ref_mv_y = dpb["ref_mv_y"]
        if ref_mv_y is None:
            ref_mv_y = jnp.zeros_like(mv_y)
        mv_params = jnp.concatenate([mv_params, ref_mv_y.astype(d)], axis=-1)
        mv_q_step, mv_scales, mv_means = jnp.split(
            self.mv_y_prior_fusion(mv_params), 3, axis=-1)
        mv_y_res, mv_y_q, mv_y_hat, mv_scales_hat = self.forward_dual_prior(
            mv_y, mv_means, mv_scales, mv_q_step, self.mv_y_spatial_prior)
        mv_y_hat = mv_y_hat * curr_mv_q

        mv_hat = self.mv_decoder(mv_y_hat)
        c1, c2, c3, warp_frame = self.motion_compensation(dpb, mv_hat)

        y = self.contextual_encoder(x, c1, c2, c3) / curr_y_q
        z = self.contextual_hyper_prior_encoder(y)
        z_hat = ste_round(z)
        hierarchical = self.contextual_hyper_prior_decoder(z_hat)
        temporal = self.temporal_prior_encoder(c3)
        ref_y = dpb["ref_y"]
        if ref_y is None:
            ref_y = jnp.zeros_like(y)
        params = jnp.concatenate([temporal, hierarchical,
                                  ref_y.astype(d)], axis=-1)
        q_step, scales, means = jnp.split(
            self.y_prior_fusion(params), 3, axis=-1)
        y_res, y_q, y_hat, scales_hat = self.forward_dual_prior(
            y, means, scales, q_step, self.y_spatial_prior)
        y_hat = y_hat * curr_y_q

        recon_feat = self.contextual_decoder(y_hat, c2, c3)
        # reference arg-order swap: actual concat = [recon_feat, c1]
        feature = self.rg_first_conv(
            jnp.concatenate([recon_feat, c1], axis=-1))
        feature = self.rg_unet_2(self.rg_unet_1(feature))
        recon_image = jnp.clip(
            self.rg_recon_conv(feature).astype(jnp.float32), 0.0, 1.0)

        if noise_quant:   # training; eval uses the rounded values
            # (reference video_model.py:461-470)
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

        mse = jnp.mean((recon_image - x.astype(jnp.float32)) ** 2,
                       axis=(1, 2, 3))
        me_mse = jnp.mean((warp_frame.astype(jnp.float32)
                           - x.astype(jnp.float32)) ** 2, axis=(1, 2, 3))

        return {
            "bpp_y": bpp_y, "bpp_z": bpp_z,
            "bpp_mv_y": bpp_mv_y, "bpp_mv_z": bpp_mv_z,
            "bpp": bpp_y + bpp_z + bpp_mv_y + bpp_mv_z,
            "mse": mse, "me_mse": me_mse,
            "dpb": {
                "ref_frame": recon_image,
                "ref_feature": feature,
                "ref_y": y_hat,
                "ref_mv_y": mv_y_hat,
            },
        }
