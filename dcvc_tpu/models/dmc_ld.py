"""DMC LD (low-delay) video codec — DCVC-UF per-frame variant.

Reference: src/models/video_model_ld.py.  frame_delay=1, y=128ch,
half-width (dcb2) blocks everywhere, 2-step checkerboard spatial prior
whose second step emits means only -> like HTS, all scale indexes are
known after the fused prior and y decodes in a single entropy pass.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.shuffle import pixel_shuffle, pixel_unshuffle
from ..layers.blocks import (
    Conv1x1, Conv3x3, DepthConvBlock, ResidualBlockUpsample,
    ResidualBlockWithStride2, SubpelConv2x,
)
from . import common


@dataclasses.dataclass(frozen=True)
class DMCLDConfig:
    frame_delay: int = 1
    ch_src: int = 3 * 8 * 8   # 192
    ch_y: int = 128
    ch_z: int = 128
    ch_d: int = 256
    ch_m: int = 256
    qp_num: int = 64


LD_CONFIG = DMCLDConfig()
TINY_LD_CONFIG = DMCLDConfig(ch_y=16, ch_z=8, ch_d=32, ch_m=32, qp_num=8)


class LDEncoder(nn.Module):
    cfg: DMCLDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, quant_step):
        c = self.cfg
        f = pixel_unshuffle(x, 8)
        f = jnp.concatenate([f, ctx], axis=-1)
        f = DepthConvBlock(c.ch_src + c.ch_m, c.ch_d, dcb2=True,
                           dtype=self.dtype, name="conv1_0")(f)
        f = DepthConvBlock(c.ch_d, c.ch_d, dcb2=True, dtype=self.dtype,
                           name="conv1_1")(f)
        f = DepthConvBlock(c.ch_d, c.ch_d, dcb2=True, dtype=self.dtype,
                           name="conv2")(f)
        f = f * quant_step
        return Conv3x3(c.ch_y, stride=2, dtype=self.dtype, name="down")(f)


class LDDecoder(nn.Module):
    cfg: DMCLDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y_hat, ctx, quant_step):
        c = self.cfg
        f = SubpelConv2x(c.ch_d, 1, dtype=self.dtype, name="up")(y_hat)
        f = jnp.concatenate([f, ctx], axis=-1)
        f = DepthConvBlock(c.ch_d + c.ch_m, c.ch_d, dcb2=True,
                           dtype=self.dtype, name="conv1_0")(f)
        f = DepthConvBlock(c.ch_d, c.ch_d, dcb2=True, dtype=self.dtype,
                           name="conv1_1")(f)
        f = DepthConvBlock(c.ch_d, c.ch_d, dcb2=True, dtype=self.dtype,
                           name="conv1_2")(f)
        f = Conv1x1(c.ch_d, dtype=self.dtype, name="conv2")(f)
        return f * quant_step


class LDReconHead(nn.Module):
    cfg: DMCLDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, for_reset=False):
        c = self.cfg
        for i in range(3):
            x = DepthConvBlock(c.ch_d, c.ch_d, dcb2=True, dtype=self.dtype,
                               name=f"conv_{i}")(x)
        x = Conv1x1(c.ch_src, dtype=self.dtype, name="head")(x)
        if for_reset:
            return x
        return pixel_shuffle(x, 8)


class LDSpatialPrior(nn.Module):
    """2-step checkerboard prior: (y_hat_0, fused params) -> means
    (video_model_ld.py:169-179)."""
    cfg: DMCLDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y_hat_0, params):
        c = self.cfg
        x = jnp.concatenate([y_hat_0.astype(self.dtype), params], axis=-1)
        x = DepthConvBlock(c.ch_y * 4, c.ch_y * 2, dcb2=True,
                           dtype=self.dtype, name="conv_0")(x)
        x = DepthConvBlock(c.ch_y * 2, c.ch_y * 2, dcb2=True,
                           dtype=self.dtype, name="conv_1")(x)
        return Conv1x1(c.ch_y, dtype=self.dtype, name="conv_2")(x)


class DMCLD(nn.Module):
    """Low-delay per-frame codec (reference DMC, video_model_ld.py:191-376)."""
    cfg: DMCLDConfig = LD_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        dd = dict(dtype=self.dtype)

        self.feature_adaptor_i = nn.Sequential(
            [DepthConvBlock(c.ch_src, c.ch_m, dcb2=True, **dd)]
            + [DepthConvBlock(c.ch_m, c.ch_m, dcb2=True, **dd) for _ in range(3)])
        self.feature_adaptor_m = nn.Sequential(
            [DepthConvBlock(c.ch_m + c.ch_d, c.ch_m, dcb2=True, **dd)]
            + [DepthConvBlock(c.ch_m, c.ch_m, dcb2=True, **dd) for _ in range(3)])
        self.feature_extractor = nn.Sequential(
            [DepthConvBlock(c.ch_m, c.ch_m, dcb2=True, **dd) for _ in range(5)])

        self.encoder = LDEncoder(c, **dd)
        self.hyper_encoder = nn.Sequential(
            [DepthConvBlock(c.ch_y, c.ch_z, dcb2=True, **dd),
             ResidualBlockWithStride2(c.ch_z, c.ch_z, dcb2=True,
                                      shortcut=False, **dd),
             ResidualBlockWithStride2(c.ch_z, c.ch_z, dcb2=True,
                                      shortcut=False, **dd)])
        self.hyper_decoder = nn.Sequential(
            [ResidualBlockUpsample(c.ch_z, c.ch_z, dcb2=True,
                                   shortcut=False, **dd),
             ResidualBlockUpsample(c.ch_z, c.ch_z, dcb2=True,
                                   shortcut=False, **dd),
             DepthConvBlock(c.ch_z, c.ch_y, dcb2=True, **dd)])
        self.temporal_prior_encoder = ResidualBlockWithStride2(
            c.ch_m, c.ch_y * 2, dcb2=True, shortcut=False, **dd)
        self.y_prior_fusion = nn.Sequential(
            [DepthConvBlock(c.ch_y * 3, c.ch_y * 3, dcb2=True, **dd),
             DepthConvBlock(c.ch_y * 3, c.ch_y * 3, dcb2=True, **dd),
             DepthConvBlock(c.ch_y * 3, c.ch_y * 3, dcb2=True, **dd),
             Conv1x1(c.ch_y * 3, **dd)])
        self.y_spatial_prior = LDSpatialPrior(c, **dd)
        self.decoder = LDDecoder(c, **dd)
        self.recon_head = LDReconHead(c, **dd)

        # FM-style log ladder init (see common.q_ladder_init)
        ones = nn.initializers.ones
        feat = common.q_ladder_init(0.5, 2.0)
        feat_inv = common.q_ladder_init(0.5, 2.0, inverse=True)
        self.q_encoder = self.param("q_encoder", feat, (c.qp_num, c.ch_d))
        self.q_decoder = self.param("q_decoder", feat_inv, (c.qp_num, c.ch_d))
        self.q_feature = self.param("q_feature", ones, (c.qp_num, c.ch_y * 2))

        self.bit_estimator_z = common.BitEstimatorModule(c.qp_num, c.ch_z)

    def _q(self, table, qp):
        q = jnp.take(table, qp, axis=0).astype(self.dtype)
        if q.ndim == 2:
            q = q[:, None, None, :]
        return q

    # ----------------------------------------------------- temporal state

    def adaptor_i(self, ref_feature):
        memory = self.feature_adaptor_i(ref_feature.astype(self.dtype))
        ctx = self.feature_extractor(memory)
        return memory, ctx

    def adaptor_m(self, memory, ref_feature):
        memory = self.feature_adaptor_m(
            jnp.concatenate([memory.astype(self.dtype),
                             ref_feature.astype(self.dtype)], axis=-1))
        ctx = self.feature_extractor(memory)
        return memory, ctx

    def reset_feature(self, feature):
        return self.recon_head(feature.astype(self.dtype), for_reset=True)

    # ------------------------------------------------------ shared stages

    def _prior_params(self, z_hat, memory, qp):
        temporal = self.temporal_prior_encoder(memory)
        # crop the 4-aligned hyper grid to the (possibly odd) y grid
        # before fusion (reference crop_hyper_params)
        hyper = self.hyper_decoder(z_hat)[
            :, :temporal.shape[1], :temporal.shape[2], :]
        fused_in = jnp.concatenate(
            [hyper, temporal * self._q(self.q_feature, qp)], axis=-1)
        return self.y_prior_fusion(fused_in)

    def prior0(self, z_int8, memory, qp, yh, yw):
        z_hat = z_int8.astype(self.dtype)
        params = self._prior_params(z_hat, memory.astype(self.dtype), qp)
        params = params[:, :yh, :yw, :]
        q_enc, q_dec, scales, means = common.separate_prior_video_infer(params)
        return q_enc, q_dec, scales, means, params

    def prior_step(self, params, y_hat_0):
        """Second checkerboard step: means only.  Shared enc/dec."""
        return self.y_spatial_prior(y_hat_0, params)

    def analysis(self, x, ctx, qp):
        from ..core.padding import pad_for_y
        y = self.encoder(x, ctx, self._q(self.q_encoder, qp))
        z = self.hyper_encoder(pad_for_y(y))  # dmc_common.cpp:73-82
        z_int8 = jnp.clip(jnp.round(z.astype(jnp.float32)), -128, 127).astype(jnp.int8)
        return y, z_int8

    def synthesis_feature(self, y_hat, ctx, qp):
        """Decoder feature only (the DPB state; encode stops here)."""
        return self.decoder(y_hat.astype(self.dtype), ctx,
                            self._q(self.q_decoder, qp))

    def recon_frames(self, feature, qp, out_h, out_w):
        frame = self.recon_head(feature)
        frame = jnp.clip(frame.astype(jnp.float32), -0.5, 0.5)
        return frame[:, :out_h, :out_w, :]

    def synthesis(self, y_hat, ctx, qp, out_h, out_w):
        feature = self.synthesis_feature(y_hat, ctx, qp)
        return self.recon_frames(feature, qp, out_h, out_w), feature

    # ------------------------------------------------------ training path

    def __call__(self, x, ref_feature, memory, qp, rng):
        """Training forward for one frame (video_model_ld.py:308-343).

        Returns (result dict, new_ref_feature(=feature), new_memory).
        """
        if memory is None:
            memory = self.feature_adaptor_i(ref_feature)
        else:
            memory = self.feature_adaptor_m(
                jnp.concatenate([memory, ref_feature], axis=-1))
        ctx = self.feature_extractor(memory)

        y = self.encoder(x, ctx, self._q(self.q_encoder, qp))
        z = self.hyper_encoder(y)
        z_hat = common.ste_round(z)

        params = self._prior_params(z_hat, memory, qp)
        yh, yw = y.shape[1], y.shape[2]
        params = params[:, :yh, :yw, :]

        y_res, y_q, y_hat, scales_hat = common.forward_prior_2x_train(
            y, params, self.y_spatial_prior)

        feature = self.decoder(y_hat, ctx, self._q(self.q_decoder, qp))
        x_hat = self.recon_head(feature)

        rng_y, rng_z = jax.random.split(rng)
        y_for_bit = common.add_noise(y_res, rng_y)
        z_for_bit = common.add_noise(z, rng_z)
        bits_y = jnp.sum(common.get_y_bits(y_for_bit, scales_hat), axis=(1, 2, 3))
        probs_z = self.bit_estimator_z.get_prob(z_for_bit, qp)
        bits_z = jnp.sum(common.probs_to_bits(probs_z), axis=(1, 2, 3))

        mse = common.get_mse(x, x_hat)
        pixel_num = x.shape[1] * x.shape[2]
        bpp = (bits_y + bits_z) / pixel_num
        result = {
            "bits_y": bits_y,
            "bits_z": bits_z,
            "bpp": bpp,
            "mse": mse,
            "x_hat": x_hat,
        }
        return result, feature, memory
