"""DMCI intra (image) codec — DCVC-UF-Intra re-designed for TPU.

Reference: src/models/image_model.py.  Channel plan (default config):
8x pixel-unshuffled input (192ch) -> 384ch encoder trunk -> y 256ch @ /16,
hyper z 128ch @ /64, 4-step quadtree spatial prior with scales+means,
64-QP per-channel quant vectors (q_scale_{enc,dec,y_enc,y_dec}).

The module exposes stage methods (analysis / prior0 / prior_step /
synthesis) so the inference runtime can compile the encode and decode
ladders from the *same* executables — the bit-exactness guarantee that
replaces the reference's shared CUDA kernels.

The channel/depth plan is a config so tests can run a scaled-down codec
and future variants can reuse the topology.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.shuffle import pixel_shuffle, pixel_unshuffle
from ..layers.blocks import (
    Conv1x1, Conv3x3, DepthConvBlock, ResidualBlockUpsample,
    ResidualBlockWithStride2,
)
from . import common


@dataclasses.dataclass(frozen=True)
class DMCIConfig:
    ch_src: int = 3 * 8 * 8   # pixel-unshuffle(8) of RGB
    ch_enc_dec: int = 384
    ch_y: int = 256
    ch_z: int = 128
    enc_depth: int = 6        # DCBs in enc_2 before the strided conv
    dec_depth: int = 12       # DCBs in dec_1 after the upsample
    qp_num: int = 64


TINY_CONFIG = DMCIConfig(ch_enc_dec=32, ch_y=16, ch_z=8,
                         enc_depth=1, dec_depth=1, qp_num=8)
# mid-size config for trained quality gates: big enough that the RD
# behavior is representative, small enough to train on one chip in hours
SMALL_CONFIG = DMCIConfig(ch_enc_dec=128, ch_y=64, ch_z=32,
                          enc_depth=2, dec_depth=3, qp_num=16)


class IntraEncoder(nn.Module):
    cfg: DMCIConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, quant_step):
        c = self.cfg
        out = pixel_unshuffle(x, 8)
        out = DepthConvBlock(c.ch_src, c.ch_enc_dec, dtype=self.dtype,
                             name="enc_1")(out)
        out = out * quant_step
        for i in range(c.enc_depth):
            out = DepthConvBlock(c.ch_enc_dec, c.ch_enc_dec, dtype=self.dtype,
                                 name=f"enc_2_{i}")(out)
        return Conv3x3(c.ch_y, stride=2, dtype=self.dtype, name="enc_2_down")(out)


class IntraDecoder(nn.Module):
    cfg: DMCIConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, quant_step):
        c = self.cfg
        out = ResidualBlockUpsample(c.ch_y, c.ch_enc_dec, dtype=self.dtype,
                                    name="dec_1_up")(x)
        for i in range(c.dec_depth):
            out = DepthConvBlock(c.ch_enc_dec, c.ch_enc_dec, dtype=self.dtype,
                                 name=f"dec_1_{i}")(out)
        out = out * quant_step
        out = DepthConvBlock(c.ch_enc_dec, c.ch_src, dtype=self.dtype,
                             name="dec_2")(out)
        return pixel_shuffle(out, 8)


class IntraHyperEncoder(nn.Module):
    cfg: DMCIConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = DepthConvBlock(c.ch_y, c.ch_z, dtype=self.dtype, name="conv_0")(x)
        x = ResidualBlockWithStride2(c.ch_z, c.ch_z, dtype=self.dtype,
                                     name="conv_1")(x)
        return ResidualBlockWithStride2(c.ch_z, c.ch_z, dtype=self.dtype,
                                        name="conv_2")(x)


class IntraHyperDecoder(nn.Module):
    cfg: DMCIConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = ResidualBlockUpsample(c.ch_z, c.ch_z, dtype=self.dtype, name="conv_0")(x)
        x = ResidualBlockUpsample(c.ch_z, c.ch_z, dtype=self.dtype, name="conv_1")(x)
        return DepthConvBlock(c.ch_z, c.ch_y, dtype=self.dtype, name="conv_2")(x)


class IntraYPriorFusion(nn.Module):
    cfg: DMCIConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cy = self.cfg.ch_y
        x = DepthConvBlock(cy, cy * 2, dtype=self.dtype, name="conv_0")(x)
        x = DepthConvBlock(cy * 2, cy * 2, dtype=self.dtype, name="conv_1")(x)
        x = DepthConvBlock(cy * 2, cy * 2, dtype=self.dtype, name="conv_2")(x)
        return Conv1x1(cy * 2, dtype=self.dtype, name="conv_3")(x)


class IntraSpatialPrior(nn.Module):
    cfg: DMCIConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cy = self.cfg.ch_y
        x = DepthConvBlock(cy * 2, cy * 2, dtype=self.dtype, name="conv_0")(x)
        x = DepthConvBlock(cy * 2, cy * 2, dtype=self.dtype, name="conv_1")(x)
        x = DepthConvBlock(cy * 2, cy * 2, dtype=self.dtype, name="conv_2")(x)
        return Conv1x1(cy * 2, dtype=self.dtype, name="conv_3")(x)


class DMCI(nn.Module):
    """DCVC-UF intra codec (reference DMCI, image_model.py:126-227)."""
    cfg: DMCIConfig = DMCIConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.enc = IntraEncoder(c, dtype=self.dtype)
        self.hyper_enc = IntraHyperEncoder(c, dtype=self.dtype)
        self.hyper_dec = IntraHyperDecoder(c, dtype=self.dtype)
        self.y_prior_fusion = IntraYPriorFusion(c, dtype=self.dtype)
        self.y_spatial_prior_reduction = Conv1x1(c.ch_y, dtype=self.dtype)
        self.y_spatial_prior_adaptor_1 = DepthConvBlock(
            c.ch_y * 2, c.ch_y * 2, force_adaptor=True, dtype=self.dtype)
        self.y_spatial_prior_adaptor_2 = DepthConvBlock(
            c.ch_y * 2, c.ch_y * 2, force_adaptor=True, dtype=self.dtype)
        self.y_spatial_prior_adaptor_3 = DepthConvBlock(
            c.ch_y * 2, c.ch_y * 2, force_adaptor=True, dtype=self.dtype)
        self.y_spatial_prior = IntraSpatialPrior(c, dtype=self.dtype)
        self.dec = IntraDecoder(c, dtype=self.dtype)

        # FM-style structural rate ladder as INIT (trainable per-QP rows
        # keep UF semantics); see common.q_ladder_init.
        feat = common.q_ladder_init(0.5, 2.0)
        feat_inv = common.q_ladder_init(0.5, 2.0, inverse=True)
        yq = common.q_ladder_init(0.3, 3.0)
        yq_inv = common.q_ladder_init(0.3, 3.0, inverse=True)
        self.q_scale_enc = self.param("q_scale_enc", feat, (c.qp_num, c.ch_enc_dec))
        self.q_scale_dec = self.param("q_scale_dec", feat_inv, (c.qp_num, c.ch_enc_dec))
        self.q_scale_y_enc = self.param("q_scale_y_enc", yq, (c.qp_num, c.ch_y))
        self.q_scale_y_dec = self.param("q_scale_y_dec", yq_inv, (c.qp_num, c.ch_y))

        self.bit_estimator_z = common.BitEstimatorModule(c.qp_num, c.ch_z)

    def _q(self, table, qp):
        """(QP_NUM, C) table -> per-sample (B, 1, 1, C) or (1, 1, C)."""
        q = jnp.take(table, qp, axis=0).astype(self.dtype)
        if q.ndim == 2:
            q = q[:, None, None, :]
        return q

    # ------------------------------------------------------ training path

    def __call__(self, x, qp, rng):
        """Training forward (reference forward_one_frame, image_model.py:150).

        x: (B, H, W, 3) YCbCr in [-0.5, 0.5] padded to /64; qp: int or (B,).
        """
        y = self.enc(x, self._q(self.q_scale_enc, qp))
        z = self.hyper_enc(y)
        z_hat = common.ste_round(z)

        params = self.y_prior_fusion(self.hyper_dec(z_hat))
        yh, yw = y.shape[1], y.shape[2]
        params = params[:, :yh, :yw, :]

        adaptors = [self.y_spatial_prior_adaptor_1,
                    self.y_spatial_prior_adaptor_2,
                    self.y_spatial_prior_adaptor_3]
        y_res, y_q, y_hat, scales_hat = common.forward_prior_4x_train(
            y, self._q(self.q_scale_y_enc, qp), self._q(self.q_scale_y_dec, qp),
            params, self.y_spatial_prior_reduction, adaptors,
            self.y_spatial_prior)

        x_hat = self.dec(y_hat, self._q(self.q_scale_dec, qp))

        rng_y, rng_z = jax.random.split(rng)
        y_for_bit = common.add_noise(y_res, rng_y)
        z_for_bit = common.add_noise(z, rng_z)
        bits_y = jnp.sum(common.get_y_bits(y_for_bit, scales_hat), axis=(1, 2, 3))
        probs_z = self.bit_estimator_z.get_prob(z_for_bit, qp)
        bits_z = jnp.sum(common.probs_to_bits(probs_z), axis=(1, 2, 3))

        mse = common.get_mse(x, x_hat)
        pixel_num = x.shape[1] * x.shape[2]
        bpp = (bits_y + bits_z) / pixel_num
        return {
            "x_hat": x_hat,
            "mse": mse,
            "bpp": bpp,
            "bits_y": bits_y,
            "bits_z": bits_z,
        }

    # ----------------------------------------------------- inference path
    # Stage methods compiled separately by the runtime; prior0/prior_step
    # are shared verbatim between the encode and decode ladders.

    def analysis(self, x, qp):
        """x (1, H, W, 3) padded -> (y * q_y_enc, z_int8).

        Frames pad to 16 so the y grid may be odd; the stride-2 hyper
        path needs 4-alignment, so y is replicate-padded for it alone
        (reference DMCCommon::pad_for_y, dmc_common.cpp:73-82)."""
        from ..core.padding import pad_for_y
        y = self.enc(x, self._q(self.q_scale_enc, qp))
        z = self.hyper_enc(pad_for_y(y))
        z_int8 = jnp.clip(jnp.round(z.astype(jnp.float32)), -128, 127).astype(jnp.int8)
        y_scaled = y * self._q(self.q_scale_y_enc, qp)
        return y_scaled, z_int8

    def prior0(self, z_int8, yh, yw):
        """z_int8 -> (scales0, means0, common_ctx).  Shared enc/dec.

        The hyper output lives on the 4-aligned grid; it is cropped to
        the (possibly odd) y grid BEFORE the fusion convs, as the
        reference does (crop_hyper_params, dmci_proxy.cpp) — fusion has
        3x3 receptive fields, so crop-after would differ at the bottom/
        right boundary."""
        z_hat = z_int8.astype(self.dtype)
        hyper = self.hyper_dec(z_hat)[:, :yh, :yw, :]
        params = self.y_prior_fusion(hyper)
        scales, means = common.separate_prior_image(params)
        ctx = self.y_spatial_prior_reduction(params)
        return scales, means, ctx

    def prior_step(self, ctx, y_hat_so_far, step):
        """Spatial prior for step k in {1,2,3}.  Shared enc/dec."""
        adaptors = [self.y_spatial_prior_adaptor_1,
                    self.y_spatial_prior_adaptor_2,
                    self.y_spatial_prior_adaptor_3]
        sp_in = jnp.concatenate([y_hat_so_far.astype(self.dtype), ctx], axis=-1)
        out = self.y_spatial_prior(adaptors[step - 1](sp_in))
        scales, means = jnp.split(out, 2, axis=-1)
        return scales, means

    def synthesis(self, y_hat_so_far, qp, out_h, out_w):
        """y_hat sum -> clamped reconstruction, cropped to (out_h, out_w)."""
        y_hat = y_hat_so_far.astype(self.dtype) * self._q(self.q_scale_y_dec, qp)
        x_hat = self.dec(y_hat, self._q(self.q_scale_dec, qp))
        x_hat = jnp.clip(x_hat.astype(jnp.float32), -0.5, 0.5)
        return x_hat[:, :out_h, :out_w, :]
