"""DCVC-RT (CVPR'25) — real-time redesign with implicit temporal modeling.

Reference: DCVC-family/DCVC-RT/src/models/video_model.py.  No motion
module: the temporal context comes from a 1x1 feature adaptor + extractor
over a single-slot DPB.  Single low-res latent (y=128, d=256, recon=320),
2-step checkerboard prior whose second step emits scales+means (ladder
decode), and module-bank rate control: per-QP vectors extended by
extra_qp with the periodic qp_shift=[0, 8, 4] schedule.

The stage methods follow the VideoCodecBase protocol, so this model runs
under the shared bitstream runtime (prior_steps=2, single_pass=False).
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.quant import ste_round
from ..core.shuffle import pixel_shuffle, pixel_unshuffle
from ..layers.blocks import (
    Conv1x1, Conv3x3, DepthwiseConv3x3, SubpelConv2x, wsilu,
)
from ..models import common as mcommon


class DepthConvBlock(nn.Module):
    """RT's DepthConvBlock (DCVC-RT/src/layers/layers.py:65-83): same dc
    trunk as UF but the FFN chunk-add is TWO-way (WSiLUChunkAdd =
    silu(x).chunk(2) sum -> 2C lanes into ffn_out), unlike UF's strided
    4-way reduction to C."""
    in_ch: int
    out_ch: int
    shortcut: bool = False
    force_adaptor: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.in_ch != self.out_ch or self.force_adaptor:
            x = Conv1x1(self.out_ch, dtype=self.dtype, name="adaptor")(x)
        h = Conv1x1(self.out_ch, dtype=self.dtype, name="dc_in")(x)
        h = wsilu(h)
        h = DepthwiseConv3x3(self.out_ch, dtype=self.dtype, name="dc_dw")(h)
        h = Conv1x1(self.out_ch, dtype=self.dtype, name="dc_out")(h)
        out = h + x

        f = Conv1x1(4 * self.out_ch, dtype=self.dtype, name="ffn_in")(out)
        f = wsilu(f)
        f1, f2 = jnp.split(f, 2, axis=-1)
        f = Conv1x1(self.out_ch, dtype=self.dtype, name="ffn_out")(f1 + f2)
        out = f + out
        if self.shortcut:
            out = out + x
        return out


class ResidualBlockWithStride2(nn.Module):
    """RT RBWS2 (layers.py:135-144): a plain 2x2 stride-2 conv (not UF's
    unshuffle+1x1) + shortcut DCB."""
    in_ch: int
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="down")(x)
        return DepthConvBlock(self.out_ch, self.out_ch, shortcut=True,
                              dtype=self.dtype, name="conv")(x)


class ResidualBlockUpsample(nn.Module):
    """RT RBU (layers.py:147-156): subpel 1x1 up + shortcut DCB."""
    in_ch: int
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # RT's subpel convs always carry a bias (layers.py:29-35)
        x = SubpelConv2x(self.out_ch, 1, force_bias=True, dtype=self.dtype,
                         name="up")(x)
        return DepthConvBlock(self.out_ch, self.out_ch, shortcut=True,
                              dtype=self.dtype, name="conv")(x)

QP_SHIFT = [0, 8, 4]
EXTRA_QP = max(QP_SHIFT)
# fa schedule driving the qp_shift (reference test_video.py:164,197)
INDEX_MAP = [0, 1, 0, 2, 0, 2, 0, 2]


@dataclasses.dataclass(frozen=True)
class DMCRTConfig:
    ch_src_d: int = 3 * 8 * 8
    ch_y: int = 128
    ch_z: int = 128
    ch_d: int = 256
    ch_recon: int = 320
    qp_num: int = 64
    frame_delay: int = 1
    prior_steps: int = 2
    single_pass: bool = False     # scales change at step 1 -> ladder

    @property
    def qp_bank(self):
        return self.qp_num + EXTRA_QP


RT_CONFIG = DMCRTConfig()
TINY_RT_CONFIG = DMCRTConfig(ch_y=16, ch_z=8, ch_d=32, ch_recon=32,
                             qp_num=8)


def shift_qp(qp, fa_idx, qp_num=64):
    """Module-bank rate control: periodic refresh positions use shifted
    q banks (reference video_model.py:378-...)."""
    return min(qp + QP_SHIFT[fa_idx], qp_num + EXTRA_QP - 1)


class RTFeatureExtractor(nn.Module):
    cfg: DMCRTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, quant):
        c, d = self.cfg, self.dtype
        x1 = DepthConvBlock(c.ch_d, c.ch_d, dtype=d, name="conv1_0")(x)
        x1 = DepthConvBlock(c.ch_d, c.ch_d, dtype=d, name="conv1_1")(x1)
        ctx_t = x1 * quant
        ctx = x1
        for i in range(4):
            ctx = DepthConvBlock(c.ch_d, c.ch_d, dtype=d,
                                 name=f"conv2_{i}")(ctx)
        return ctx, ctx_t


class RTEncoder(nn.Module):
    cfg: DMCRTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, quant_step):
        c, d = self.cfg, self.dtype
        f = pixel_unshuffle(x, 8)
        f = Conv1x1(c.ch_d, dtype=d, name="conv1")(f)
        f = DepthConvBlock(c.ch_d * 2, c.ch_d, dtype=d, name="conv2_0")(
            jnp.concatenate([f, ctx], axis=-1))
        f = DepthConvBlock(c.ch_d, c.ch_d, dtype=d, name="conv2_1")(f)
        f = DepthConvBlock(c.ch_d, c.ch_d, dtype=d, name="conv3")(f)
        f = f * quant_step
        return Conv3x3(c.ch_y, stride=2, dtype=d, name="down")(f)


class RTDecoder(nn.Module):
    cfg: DMCRTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y_hat, ctx, quant_step):
        c, d = self.cfg, self.dtype
        f = SubpelConv2x(c.ch_d, 3, dtype=d, name="up")(y_hat)
        f = jnp.concatenate([f, ctx], axis=-1)
        f = DepthConvBlock(c.ch_d * 2, c.ch_d, dtype=d, name="conv1_0")(f)
        f = DepthConvBlock(c.ch_d, c.ch_d, dtype=d, name="conv1_1")(f)
        f = DepthConvBlock(c.ch_d, c.ch_d, dtype=d, name="conv1_2")(f)
        f = Conv1x1(c.ch_d, dtype=d, name="conv2")(f)
        return f * quant_step


class RTReconGeneration(nn.Module):
    cfg: DMCRTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, quant_step):
        c, d = self.cfg, self.dtype
        f = DepthConvBlock(c.ch_d, c.ch_recon, dtype=d, name="conv_0")(x)
        for i in (1, 2, 3):
            f = DepthConvBlock(c.ch_recon, c.ch_recon, dtype=d,
                               name=f"conv_{i}")(f)
        f = f * quant_step
        f = Conv1x1(c.ch_src_d, dtype=d, name="head")(f)
        out = pixel_shuffle(f, 8)
        return jnp.clip(out, 0.0, 1.0)


class DMCRT(nn.Module):
    """RT P-frame codec with stage methods for the shared runtime."""
    cfg: DMCRTConfig = RT_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c, d = self.cfg, self.dtype
        self.feature_adaptor_i = DepthConvBlock(c.ch_src_d, c.ch_d, dtype=d)
        self.feature_adaptor_p = Conv1x1(c.ch_d, dtype=d)
        self.feature_extractor = RTFeatureExtractor(c, dtype=d)
        self.encoder = RTEncoder(c, dtype=d)
        self.hyper_encoder = nn.Sequential([
            DepthConvBlock(c.ch_y, c.ch_z, dtype=d),
            ResidualBlockWithStride2(c.ch_z, c.ch_z, dtype=d),
            ResidualBlockWithStride2(c.ch_z, c.ch_z, dtype=d),
        ])
        self.hyper_decoder = nn.Sequential([
            ResidualBlockUpsample(c.ch_z, c.ch_z, dtype=d),
            ResidualBlockUpsample(c.ch_z, c.ch_z, dtype=d),
            DepthConvBlock(c.ch_z, c.ch_y, dtype=d),
        ])
        self.temporal_prior_encoder = ResidualBlockWithStride2(
            c.ch_d, c.ch_y * 2, dtype=d)
        self.y_prior_fusion = nn.Sequential(
            [DepthConvBlock(c.ch_y * 3, c.ch_y * 3, dtype=d)
             for _ in range(3)]
            + [Conv1x1(c.ch_y * 3, dtype=d)])
        self.y_spatial_prior = nn.Sequential([
            DepthConvBlock(c.ch_y * 4, c.ch_y * 3, dtype=d),
            DepthConvBlock(c.ch_y * 3, c.ch_y * 3, dtype=d),
            Conv1x1(c.ch_y * 2, dtype=d),
        ])
        self.decoder = RTDecoder(c, dtype=d)
        self.recon_generation_net = RTReconGeneration(c, dtype=d)

        ones = nn.initializers.ones
        qb = c.qp_bank
        self.q_encoder = self.param("q_encoder", ones, (qb, c.ch_d))
        self.q_decoder = self.param("q_decoder", ones, (qb, c.ch_d))
        self.q_feature = self.param("q_feature", ones, (qb, c.ch_d))
        self.q_recon = self.param("q_recon", ones, (qb, c.ch_recon))

        self.bit_estimator_z = mcommon.BitEstimatorModule(c.qp_bank, c.ch_z)

    def _q(self, table, qp):
        q = jnp.take(table, qp, axis=0).astype(self.dtype)
        if q.ndim == 2:
            q = q[:, None, None, :]
        return q

    # ------------------------------------------- runtime stage protocol

    def adaptor_i(self, ref_feature):
        """ref_feature: 8x-unshuffled frame (192ch).  Returns (memory=ctx_t
        placeholder 'feature', ctx): the runtime threads memory=feature."""
        feature = self.feature_adaptor_i(ref_feature.astype(self.dtype))
        return feature, feature

    def adaptor_m(self, memory, ref_feature):
        feature = self.feature_adaptor_p(ref_feature.astype(self.dtype))
        return feature, feature

    def reset_feature(self, feature):
        """Feature refresh: re-seed through the recon head (bank 0)."""
        frame = self.recon_generation_net(feature.astype(self.dtype),
                                          self._q(self.q_recon, 0))
        return pixel_unshuffle(frame, 8)

    def analysis(self, x, feature, qp):
        ctx, ctx_t = self.feature_extractor(feature,
                                            self._q(self.q_feature, qp))
        from ..core.padding import pad_for_y
        y = self.encoder(x, ctx, self._q(self.q_encoder, qp))
        z = self.hyper_encoder(pad_for_y(y))  # RT video_model.py:311
        z_int8 = jnp.clip(jnp.round(z.astype(jnp.float32)),
                          -128, 127).astype(jnp.int8)
        return y, z_int8

    def prior0(self, z_int8, feature, qp, yh, yw):
        ctx, ctx_t = self.feature_extractor(feature.astype(self.dtype),
                                            self._q(self.q_feature, qp))
        temporal = self.temporal_prior_encoder(ctx_t)
        hyper = self.hyper_decoder(z_int8.astype(self.dtype))
        hyper = hyper[:, :yh, :yw, :]
        params = self.y_prior_fusion(
            jnp.concatenate([hyper, temporal], axis=-1))
        q_enc, q_dec, scales, means = mcommon.separate_prior_video_infer(
            params)
        return q_enc, q_dec, scales, means, params

    def prior_step(self, spctx, y_hat_so_far):
        sp_in = jnp.concatenate([y_hat_so_far.astype(self.dtype), spctx],
                                axis=-1)
        out = self.y_spatial_prior(sp_in)
        scales, means = jnp.split(out, 2, axis=-1)
        return scales, means

    def synthesis_feature(self, y_hat, ctx_unused, qp):
        """Decoder feature only (the DPB state; encode stops here).
        ctx passes through the runtime from the adaptor: here it is the
        adapted feature; recompute the decoder context from it."""
        ctx, _ = self.feature_extractor(ctx_unused,
                                        self._q(self.q_feature, qp))
        return self.decoder(y_hat.astype(self.dtype), ctx,
                            self._q(self.q_decoder, qp))

    def recon_frames(self, feature, qp, out_h, out_w):
        x_hat = self.recon_generation_net(feature, self._q(self.q_recon, qp))
        return x_hat.astype(jnp.float32)[:, :out_h, :out_w, :]

    def synthesis(self, y_hat, ctx_unused, qp, out_h, out_w):
        feature = self.synthesis_feature(y_hat, ctx_unused, qp)
        return self.recon_frames(feature, qp, out_h, out_w), feature

    # ------------------------------------------------------ training path

    def __call__(self, x, ref_feature, memory, qp, rng):
        """Training forward for one frame.  x: (B, H, W, 3) RGB [0, 1];
        ref_feature: unshuffled frame (192ch) or decoder feature (ch_d)
        with memory flag; returns (result, feature, feature)."""
        if memory is None:
            feature = self.feature_adaptor_i(ref_feature)
        else:
            feature = self.feature_adaptor_p(ref_feature)
        ctx, ctx_t = self.feature_extractor(feature,
                                            self._q(self.q_feature, qp))

        y = self.encoder(x.astype(self.dtype), ctx,
                         self._q(self.q_encoder, qp))
        z = self.hyper_encoder(y)
        z_hat = mcommon.ste_round(z)

        temporal = self.temporal_prior_encoder(ctx_t)
        hyper = self.hyper_decoder(z_hat)
        yh, yw = y.shape[1], y.shape[2]
        hyper = hyper[:, :yh, :yw, :]
        params = self.y_prior_fusion(
            jnp.concatenate([hyper, temporal], axis=-1))

        def spatial_prior_fn(y_hat_0, common_params):
            return self.prior_step(common_params, y_hat_0)

        # 2-step checkerboard with scales+means second step
        q_enc, q_dec, scales, means = mcommon.separate_prior_video(params)
        y_scaled = y * q_enc
        from ..core.masks import make_mask_2x
        mask_0, mask_1 = make_mask_2x(yh, yw, y.shape[-1])
        y_res_0, y_q_0, y_hat_0, s_hat_0 = mcommon.process_with_mask_train(
            y_scaled, scales, means, mask_0)
        scales1, means1 = spatial_prior_fn(y_hat_0, params)
        y_res_1, y_q_1, y_hat_1, s_hat_1 = mcommon.process_with_mask_train(
            y_scaled, scales1, means1, mask_1)
        y_hat = (y_hat_0 + y_hat_1) * q_dec
        y_res = y_res_0 + y_res_1
        scales_hat = s_hat_0 + s_hat_1

        feature_out = self.decoder(y_hat, ctx, self._q(self.q_decoder, qp))
        x_hat = self.recon_generation_net(feature_out,
                                          self._q(self.q_recon, qp))

        rng_y, rng_z = jax.random.split(rng)
        y_noisy = mcommon.add_noise(y_res, rng_y)
        z_noisy = mcommon.add_noise(z, rng_z)
        bits_y = jnp.sum(mcommon.get_y_bits(y_noisy, scales_hat),
                         axis=(1, 2, 3))
        bits_z = jnp.sum(mcommon.probs_to_bits(
            self.bit_estimator_z.get_prob(z_noisy, qp)), axis=(1, 2, 3))

        pixel_num = x.shape[1] * x.shape[2]
        mse = jnp.mean((x_hat.astype(jnp.float32)
                        - x.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
        return ({
            "bits_y": bits_y,
            "bits_z": bits_z,
            "bpp": (bits_y + bits_z) / pixel_num,
            "mse": mse,
            "x_hat": x_hat,
        }, feature_out, feature_out)


class DMCRTCodec:
    """Factory: DMCRT under the shared video bitstream runtime."""

    def __new__(cls, model, params, **kwargs):
        from ..runtime.video_codec import VideoCodecBase
        kwargs.setdefault("max_ec", 2)  # RT SPS carries a 1-bit ec_part
        return VideoCodecBase(model, params, **kwargs)

    @staticmethod
    def init_random(rng=None, cfg=None, dtype=jnp.bfloat16, init_scale=1.0,
                    **kwargs):
        from ..runtime.video_codec import (
            VideoCodecBase, _init_both_branches)
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or RT_CONFIG
        model = DMCRT(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        ref_intra = jnp.zeros((1, 8, 8, cfg.ch_src_d), dtype)
        ref_feat = jnp.zeros((1, 8, 8, cfg.ch_d), dtype)
        memory = jnp.zeros((1, 8, 8, cfg.ch_d), dtype)
        params = _init_both_branches(model, x, ref_intra, ref_feat, memory,
                                     rng, init_scale)
        kwargs.setdefault("max_ec", 2)  # RT SPS carries a 1-bit ec_part
        return VideoCodecBase(model, params, **kwargs)
