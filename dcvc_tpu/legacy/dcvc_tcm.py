"""DCVC-TCM (TMM'22) — temporal context mining.

Reference: DCVC-family/DCVC-TCM/src/models/video_net_dmc.py.  3-scale
feature pyramid mined from a propagated feature-domain DPB, GDN
contextual coding at 3 scales, hyper + temporal prior (drops the
baseline's AR model), Laplace rates.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.quant import ste_round
from ..models import common as mcommon
from .dcvc_fm import bilinear_downsample_2x
from .dcvc_hem import HEMResBlock
from .dcvc_net import _conv, _deconv, laplace_bits_sum
from .fm_layers import ConvK, SubpelConv, lrelu
from .gdn import GDN
from .ops import flow_warp
from .spynet import MESpynet


@dataclasses.dataclass(frozen=True)
class DMCTCMConfig:
    ch_mv: int = 128
    ch_n: int = 64
    ch_m: int = 96


TCM_CONFIG = DMCTCMConfig()
TINY_TCM_CONFIG = DMCTCMConfig(ch_mv=8, ch_n=8, ch_m=8)


class DMCTCM(nn.Module):
    """TCM P-frame model (training forward).  State: (ref_frame,
    ref_feature) — the feature-domain DPB."""
    cfg: DMCTCMConfig = TCM_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c, d = self.cfg, self.dtype
        MV, N, M = c.ch_mv, c.ch_n, c.ch_m

        self.optic_flow = MESpynet(dtype=d)

        mv_enc = []
        for i in range(3):
            mv_enc += [_conv(MV, 3, 2, dtype=d), GDN(MV, dtype=d),
                       HEMResBlock(MV, start_from_relu=False, dtype=d),
                       lambda x: lrelu(x, 0.1)]
        mv_enc.append(_conv(MV, 3, 2, dtype=d))
        self.mv_encoder = nn.Sequential(mv_enc)

        self.mv_prior_encoder = nn.Sequential([
            _conv(N, 3, dtype=d), nn.leaky_relu,
            _conv(N, 3, 2, dtype=d), nn.leaky_relu,
            _conv(N, 3, 2, dtype=d),
        ])
        self.mv_prior_decoder = nn.Sequential([
            _deconv(MV, 3, 2, dtype=d), nn.leaky_relu,
            _deconv(MV * 3 // 2, 3, 2, dtype=d), nn.leaky_relu,
            _deconv(MV * 2, 3, 1, dtype=d),
        ])
        self.mv_decoder = nn.Sequential([
            _deconv(MV, 3, 2, dtype=d), lambda x: lrelu(x, 0.1),
            HEMResBlock(MV, start_from_relu=False, dtype=d),
            GDN(MV, inverse=True, dtype=d),
            _deconv(MV, 3, 2, dtype=d), GDN(MV, inverse=True, dtype=d),
            _deconv(MV, 3, 2, dtype=d), GDN(MV, inverse=True, dtype=d),
            _deconv(2, 3, 2, dtype=d),
        ])

        self.feature_adaptor_I = _conv(N, 3, dtype=d)
        self.feature_adaptor_P = ConvK(N, kernel=1, dtype=d)

        self.fx_conv1 = _conv(N, 3, dtype=d)
        self.fx_res1 = HEMResBlock(N, dtype=d)
        self.fx_conv2 = _conv(N, 3, 2, dtype=d)
        self.fx_res2 = HEMResBlock(N, dtype=d)
        self.fx_conv3 = _conv(N, 3, 2, dtype=d)
        self.fx_res3 = HEMResBlock(N, dtype=d)

        self.cf_conv3_up = SubpelConv(N, r=2, kernel=3, dtype=d)
        self.cf_res3_up = HEMResBlock(N, dtype=d)
        self.cf_conv3_out = _conv(N, 3, dtype=d)
        self.cf_res3_out = HEMResBlock(N, dtype=d)
        self.cf_conv2_up = SubpelConv(N, r=2, kernel=3, dtype=d)
        self.cf_res2_up = HEMResBlock(N, dtype=d)
        self.cf_conv2_out = _conv(N, 3, dtype=d)
        self.cf_res2_out = HEMResBlock(N, dtype=d)
        self.cf_conv1_out = _conv(N, 3, dtype=d)
        self.cf_res1_out = HEMResBlock(N, dtype=d)

        def bres(ch):
            return HEMResBlock(ch, slope=0.1, start_from_relu=False,
                               end_with_relu=True, bottleneck=True, dtype=d)

        # contextual encoder (GDN at 3 scales, video_net_dmc.py:71-97)
        self.ce_conv1 = _conv(N, 3, 2, dtype=d)
        self.ce_gdn1 = GDN(N, dtype=d)
        self.ce_res1 = bres(N * 2)
        self.ce_conv2 = _conv(N, 3, 2, dtype=d)
        self.ce_gdn2 = GDN(N, dtype=d)
        self.ce_res2 = bres(N * 2)
        self.ce_conv3 = _conv(N, 3, 2, dtype=d)
        self.ce_gdn3 = GDN(N, dtype=d)
        self.ce_conv4 = _conv(M, 3, 2, dtype=d)

        self.cd_up1 = SubpelConv(N, r=2, kernel=3, dtype=d)
        self.cd_gdn1 = GDN(N, inverse=True, dtype=d)
        self.cd_up2 = SubpelConv(N, r=2, kernel=3, dtype=d)
        self.cd_gdn2 = GDN(N, inverse=True, dtype=d)
        self.cd_res1 = bres(N * 2)
        self.cd_up3 = SubpelConv(N, r=2, kernel=3, dtype=d)
        self.cd_gdn3 = GDN(N, inverse=True, dtype=d)
        self.cd_res2 = bres(N * 2)
        self.cd_up4 = SubpelConv(32, r=2, kernel=3, dtype=d)

        self.contextual_hyper_prior_encoder = nn.Sequential([
            _conv(N, 3, dtype=d), nn.leaky_relu,
            _conv(N, 3, 2, dtype=d), nn.leaky_relu,
            _conv(N, 3, 2, dtype=d),
        ])
        self.contextual_hyper_prior_decoder = nn.Sequential([
            _deconv(M, 3, 2, dtype=d), nn.leaky_relu,
            _deconv(M * 3 // 2, 3, 2, dtype=d), nn.leaky_relu,
            _deconv(M * 2, 3, 1, dtype=d),
        ])

        # temporal prior over all 3 context scales (GDN, :127-147)
        self.tp_conv1 = _conv(N, 3, 2, dtype=d)
        self.tp_gdn1 = GDN(N, dtype=d)
        self.tp_conv2 = _conv(M, 3, 2, dtype=d)
        self.tp_gdn2 = GDN(M, dtype=d)
        self.tp_conv3 = _conv(M * 3 // 2, 3, 2, dtype=d)
        self.tp_gdn3 = GDN(M * 3 // 2, dtype=d)
        self.tp_conv4 = _conv(M * 2, 3, 2, dtype=d)

        self.contextual_entropy_parameter = nn.Sequential([
            _conv(M * 10 // 3, 3, dtype=d), nn.leaky_relu,
            _conv(M * 8 // 3, 3, dtype=d), nn.leaky_relu,
            _conv(M * 6 // 3, 3, dtype=d),
        ])

        self.rg_conv = _conv(N, 3, dtype=d)
        self.rg_res1 = HEMResBlock(N, dtype=d)
        self.rg_res2 = HEMResBlock(N, dtype=d)
        self.rg_recon_conv = _conv(3, 3, dtype=d)

        self.bit_estimator_z = mcommon.BitEstimatorModule(1, c.ch_n)
        self.bit_estimator_z_mv = mcommon.BitEstimatorModule(1, c.ch_n)

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

    def motion_compensation(self, ref_frame, ref_feature, mv):
        warpframe = flow_warp(ref_frame, mv)
        mv2 = bilinear_downsample_2x(mv) / 2
        mv3 = bilinear_downsample_2x(mv2) / 2
        if ref_feature is None:
            feature = self.feature_adaptor_I(ref_frame)
        else:
            feature = self.feature_adaptor_P(ref_feature.astype(self.dtype))
        f1, f2, f3 = self.feature_extractor(feature)
        c1 = flow_warp(f1, mv)
        c2 = flow_warp(f2, mv2)
        c3 = flow_warp(f3, mv3)
        c1, c2, c3 = self.context_fusion(c1, c2, c3)
        return c1, c2, c3, warpframe

    # ----------------------------------------- inference stage methods
    #
    # Reference compress/decompress (video_net_dmc.py:321-380): single-
    # shot dense gaussian coding, no spatial steps.  Shared enc/dec
    # stage programs.

    def mv_analysis(self, x, ref_frame):
        """ENC-only: flow + mv encode + mv hyper."""
        est_mv = self.optic_flow(x.astype(self.dtype),
                                 ref_frame.astype(self.dtype))
        mv_y = self.mv_encoder(est_mv)
        mv_z = self.mv_prior_encoder(mv_y)
        mv_z_int = jnp.clip(jnp.round(mv_z.astype(jnp.float32)),
                            -30000, 30000).astype(jnp.int16)
        return mv_y.astype(jnp.float32), mv_z_int

    def mv_prior(self, mv_z_int):
        """SHARED: (scales, means) for the dense mv grid."""
        scales, means = jnp.split(
            self.mv_prior_decoder(mv_z_int.astype(self.dtype)), 2, axis=-1)
        return scales.astype(jnp.float32), means.astype(jnp.float32)

    def mv_synthesis(self, mv_y_hat):
        return self.mv_decoder(mv_y_hat.astype(self.dtype))

    def mc(self, ref_frame, ref_feature, has_feature, mv_hat):
        c1, c2, c3, _ = self.motion_compensation(
            ref_frame.astype(self.dtype),
            ref_feature if has_feature else None, mv_hat)
        return c1, c2, c3

    def ctx_analysis(self, x, c1, c2, c3):
        """ENC-only: contextual encode + hyper."""
        xd = x.astype(self.dtype)
        f = self.ce_gdn1(self.ce_conv1(jnp.concatenate([xd, c1], axis=-1)))
        f = self.ce_res1(jnp.concatenate([f, c2], axis=-1))
        f = self.ce_gdn2(self.ce_conv2(f))
        f = self.ce_res2(jnp.concatenate([f, c3], axis=-1))
        y = self.ce_conv4(self.ce_gdn3(self.ce_conv3(f)))
        z = self.contextual_hyper_prior_encoder(y)
        z_int = jnp.clip(jnp.round(z.astype(jnp.float32)),
                         -30000, 30000).astype(jnp.int16)
        return y.astype(jnp.float32), z_int

    def ctx_prior(self, z_int, c1, c2, c3):
        """SHARED: hyper + temporal -> (scales, means)."""
        hierarchical = self.contextual_hyper_prior_decoder(
            z_int.astype(self.dtype))
        t = self.tp_gdn1(self.tp_conv1(c1))
        t = self.tp_gdn2(self.tp_conv2(jnp.concatenate([t, c2], axis=-1)))
        t = self.tp_gdn3(self.tp_conv3(jnp.concatenate([t, c3], axis=-1)))
        temporal = self.tp_conv4(t)
        params = jnp.concatenate([temporal, hierarchical], axis=-1)
        scales, means = jnp.split(
            self.contextual_entropy_parameter(params), 2, axis=-1)
        return scales.astype(jnp.float32), means.astype(jnp.float32)

    def synthesis(self, y_hat, c1, c2, c3):
        """SHARED: contextual decode + recon -> (x_hat [0,1], feature)."""
        rf = self.cd_gdn1(self.cd_up1(y_hat.astype(self.dtype)))
        rf = self.cd_gdn2(self.cd_up2(rf))
        rf = self.cd_res1(jnp.concatenate([rf, c3], axis=-1))
        rf = self.cd_gdn3(self.cd_up3(rf))
        rf = self.cd_res2(jnp.concatenate([rf, c2], axis=-1))
        recon_feat = self.cd_up4(rf)
        # reference arg-order swap: actual concat = [recon_feat, c1]
        feature = self.rg_res2(self.rg_res1(self.rg_conv(
            jnp.concatenate([recon_feat, c1], axis=-1))))
        recon = jnp.clip(self.rg_recon_conv(feature).astype(jnp.float32),
                         0.0, 1.0)
        return recon, feature

    def __call__(self, x, ref_frame, ref_feature):
        """Training forward (video_net_dmc.py:430-...).  Frames RGB [0,1]."""
        d = self.dtype
        x = x.astype(d)
        ref_frame = ref_frame.astype(d)

        est_mv = self.optic_flow(x, ref_frame)
        mv_y = self.mv_encoder(est_mv)
        mv_z = self.mv_prior_encoder(mv_y)
        mv_z_hat = ste_round(mv_z)
        mv_scales, mv_means = jnp.split(
            self.mv_prior_decoder(mv_z_hat), 2, axis=-1)
        mv_y_q = ste_round(mv_y - mv_means)
        mv_y_hat = mv_y_q + mv_means

        mv_hat = self.mv_decoder(mv_y_hat)
        c1, c2, c3, warp_frame = self.motion_compensation(
            ref_frame, ref_feature, mv_hat)

        f = self.ce_gdn1(self.ce_conv1(jnp.concatenate([x, c1], axis=-1)))
        f = self.ce_res1(jnp.concatenate([f, c2], axis=-1))
        f = self.ce_gdn2(self.ce_conv2(f))
        f = self.ce_res2(jnp.concatenate([f, c3], axis=-1))
        y = self.ce_conv4(self.ce_gdn3(self.ce_conv3(f)))

        z = self.contextual_hyper_prior_encoder(y)
        z_hat = ste_round(z)
        hierarchical = self.contextual_hyper_prior_decoder(z_hat)

        t = self.tp_gdn1(self.tp_conv1(c1))
        t = self.tp_gdn2(self.tp_conv2(jnp.concatenate([t, c2], axis=-1)))
        t = self.tp_gdn3(self.tp_conv3(jnp.concatenate([t, c3], axis=-1)))
        temporal = self.tp_conv4(t)

        params = jnp.concatenate([temporal, hierarchical], axis=-1)
        scales, means = jnp.split(
            self.contextual_entropy_parameter(params), 2, axis=-1)
        y_q = ste_round(y - means)
        y_hat = y_q + means

        rf = self.cd_gdn1(self.cd_up1(y_hat))
        rf = self.cd_gdn2(self.cd_up2(rf))
        rf = self.cd_res1(jnp.concatenate([rf, c3], axis=-1))
        rf = self.cd_gdn3(self.cd_up3(rf))
        rf = self.cd_res2(jnp.concatenate([rf, c2], axis=-1))
        recon_feat = self.cd_up4(rf)

        # reference arg-order swap: actual concat = [recon_feat, c1]
        feature = self.rg_res2(self.rg_res1(self.rg_conv(
            jnp.concatenate([recon_feat, c1], axis=-1))))
        recon_image = self.rg_recon_conv(feature).astype(jnp.float32)

        pixel_num = x.shape[1] * x.shape[2]
        bpp_y = laplace_bits_sum(y_q, scales) / pixel_num
        bpp_mv_y = laplace_bits_sum(mv_y_q, mv_scales) / pixel_num

        import math
        def z_bits(zz, est):
            probs = est.get_prob(zz, 0)
            bits = jnp.clip(-jnp.log(probs + 1e-5) / math.log(2.0), 0, 50)
            return jnp.sum(bits, axis=(1, 2, 3))
        bpp_z = z_bits(z_hat, self.bit_estimator_z) / pixel_num
        bpp_mv_z = z_bits(mv_z_hat, self.bit_estimator_z_mv) / pixel_num

        mse = jnp.mean((recon_image - x.astype(jnp.float32)) ** 2,
                       axis=(1, 2, 3))
        me_mse = jnp.mean((warp_frame.astype(jnp.float32)
                           - x.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
        return {
            "bpp_y": bpp_y, "bpp_z": bpp_z,
            "bpp_mv_y": bpp_mv_y, "bpp_mv_z": bpp_mv_z,
            "bpp": bpp_y + bpp_z + bpp_mv_y + bpp_mv_z,
            "mse": mse, "me_mse": me_mse,
            "recon_image": recon_image,
            "feature": feature,
        }
