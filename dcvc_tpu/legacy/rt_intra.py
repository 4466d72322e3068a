"""DCVC-RT intra (image) codec model.

Reference: DCVC-family/DCVC-RT/src/models/image_model.py.  Structurally
a DMCI predecessor: 8x-unshuffled input -> 368-ch trunk -> y 256 @ /16,
hyper z 128 @ /64, the same 4-step quadtree spatial prior — but the y
quantization steps are HYPER-PREDICTED per-position maps rather than
per-QP channel vectors: the prior fusion emits 2N+2 channels whose first
two become q_enc / q_dec via sigmoid()*1.5+0.5
(DCVC-RT/src/models/common_model.py:63-73).  Only the feature-domain
per-QP banks (q_scale_enc/dec at 368ch) remain.  Signal domain is
[0, 1] (DCVC-RT/test_video.py:61), recon clamped to it.

The stage-method decomposition mirrors models/dmci.py so the image
runtime pattern applies; runtime/rt_image_codec.py compiles the ladders.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.shuffle import pixel_shuffle, pixel_unshuffle
from ..layers.blocks import Conv1x1, DepthConvBlock
from ..models import common
from ..models.dmci import (
    DMCIConfig, IntraDecoder, IntraEncoder, IntraHyperDecoder,
    IntraHyperEncoder, IntraSpatialPrior,
)


@dataclasses.dataclass(frozen=True)
class DMCIRTConfig:
    ch_src: int = 3 * 8 * 8
    ch_enc_dec: int = 368     # reference g_ch_enc_dec (image_model.py:14)
    ch_y: int = 256
    ch_z: int = 128
    enc_depth: int = 6
    dec_depth: int = 12
    qp_num: int = 64

    def as_dmci(self):
        """The sub-modules are shared with models/dmci.py; they only read
        these fields."""
        return DMCIConfig(ch_src=self.ch_src, ch_enc_dec=self.ch_enc_dec,
                          ch_y=self.ch_y, ch_z=self.ch_z,
                          enc_depth=self.enc_depth, dec_depth=self.dec_depth,
                          qp_num=self.qp_num)


TINY_RT_INTRA_CONFIG = DMCIRTConfig(ch_enc_dec=32, ch_y=16, ch_z=8,
                                    enc_depth=1, dec_depth=1, qp_num=8)


class RTPriorFusion(nn.Module):
    """y_prior_fusion emitting 2N+2: [q_enc, q_dec, scales, means]
    (image_model.py:122-127)."""
    cfg: DMCIRTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cy = self.cfg.ch_y
        x = DepthConvBlock(cy, cy * 2, dtype=self.dtype, name="conv_0")(x)
        x = DepthConvBlock(cy * 2, cy * 2, dtype=self.dtype, name="conv_1")(x)
        x = DepthConvBlock(cy * 2, cy * 2, dtype=self.dtype, name="conv_2")(x)
        return Conv1x1(cy * 2 + 2, dtype=self.dtype, name="conv_3")(x)


def separate_prior_rt_image(params):
    """(.., 2N+2) -> q_enc, q_dec (sigmoid*1.5+0.5), scales, means
    (DCVC-RT common_model.py:68-73, image branch)."""
    q = jax.nn.sigmoid(params[..., :2].astype(jnp.float32)) * 1.5 + 0.5
    q_enc, q_dec = q[..., 0:1], q[..., 1:2]
    scales, means = jnp.split(params[..., 2:], 2, axis=-1)
    return q_enc, q_dec, scales, means


class DMCIRT(nn.Module):
    """DCVC-RT intra codec (image_model.py:103-209)."""
    cfg: DMCIRTConfig = DMCIRTConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        dc = c.as_dmci()
        self.enc = IntraEncoder(dc, dtype=self.dtype)
        self.hyper_enc = IntraHyperEncoder(dc, dtype=self.dtype)
        self.hyper_dec = IntraHyperDecoder(dc, dtype=self.dtype)
        self.y_prior_fusion = RTPriorFusion(c, dtype=self.dtype)
        self.y_spatial_prior_reduction = Conv1x1(c.ch_y, dtype=self.dtype)
        self.y_spatial_prior_adaptor_1 = DepthConvBlock(
            c.ch_y * 2, c.ch_y * 2, force_adaptor=True, dtype=self.dtype)
        self.y_spatial_prior_adaptor_2 = DepthConvBlock(
            c.ch_y * 2, c.ch_y * 2, force_adaptor=True, dtype=self.dtype)
        self.y_spatial_prior_adaptor_3 = DepthConvBlock(
            c.ch_y * 2, c.ch_y * 2, force_adaptor=True, dtype=self.dtype)
        self.y_spatial_prior = IntraSpatialPrior(dc, dtype=self.dtype)
        self.dec = IntraDecoder(dc, dtype=self.dtype)

        feat = common.q_ladder_init(0.5, 2.0)
        feat_inv = common.q_ladder_init(0.5, 2.0, inverse=True)
        self.q_scale_enc = self.param("q_scale_enc", feat,
                                      (c.qp_num, c.ch_enc_dec))
        self.q_scale_dec = self.param("q_scale_dec", feat_inv,
                                      (c.qp_num, c.ch_enc_dec))
        self.bit_estimator_z = common.BitEstimatorModule(c.qp_num, c.ch_z)

    def _q(self, table, qp):
        q = jnp.take(table, qp, axis=0).astype(self.dtype)
        if q.ndim == 2:
            q = q[:, None, None, :]
        return q

    # ------------------------------------------------------ training path

    def __call__(self, x, qp, rng):
        """Training forward.  x: (B, H, W, 3) RGB in [0, 1] padded /64
        (RT feeds x/255 with no centering, test_video.py:61)."""
        y = self.enc(x, self._q(self.q_scale_enc, qp))
        z = self.hyper_enc(y)
        z_hat = common.ste_round(z)

        params = self.y_prior_fusion(self.hyper_dec(z_hat))
        yh, yw = y.shape[1], y.shape[2]
        params = params[:, :yh, :yw, :]
        q_enc, q_dec, scales, means = separate_prior_rt_image(params)

        adaptors = [self.y_spatial_prior_adaptor_1,
                    self.y_spatial_prior_adaptor_2,
                    self.y_spatial_prior_adaptor_3]
        y_s = y * q_enc.astype(y.dtype)
        ctx = self.y_spatial_prior_reduction(params)
        masks = common.make_mask_4x(yh, yw, self.cfg.ch_y)
        y_res_list, scales_list = [], []
        y_hat_so_far = jnp.zeros_like(y_s)
        for step in range(4):
            if step > 0:
                sp_in = jnp.concatenate([y_hat_so_far, ctx], axis=-1)
                out = self.y_spatial_prior(adaptors[step - 1](sp_in))
                scales, means = jnp.split(out, 2, axis=-1)
            y_res, _, y_hat, s_hat = common.process_with_mask_train(
                y_s, scales, means, masks[step])
            y_hat_so_far = y_hat_so_far + y_hat
            y_res_list.append(y_res)
            scales_list.append(s_hat)
        y_hat = y_hat_so_far * q_dec.astype(y_s.dtype)

        x_hat = self.dec(y_hat, self._q(self.q_scale_dec, qp))

        rng_y, rng_z = jax.random.split(rng)
        y_for_bit = common.add_noise(sum(y_res_list), rng_y)
        s_all = sum(scales_list)
        z_for_bit = common.add_noise(z, rng_z)
        bits_y = jnp.sum(common.get_y_bits(y_for_bit, s_all), axis=(1, 2, 3))
        probs_z = self.bit_estimator_z.get_prob(z_for_bit, qp)
        bits_z = jnp.sum(common.probs_to_bits(probs_z), axis=(1, 2, 3))

        mse = jnp.mean((x - x_hat) ** 2, axis=(1, 2, 3))
        pixel_num = x.shape[1] * x.shape[2]
        return {"x_hat": x_hat, "mse": mse,
                "bpp": (bits_y + bits_z) / pixel_num,
                "bits_y": bits_y, "bits_z": bits_z}

    # ----------------------------------------------------- inference path
    # Same decomposition as models/dmci.py but prior0 additionally emits
    # the hyper-predicted q_enc/q_dec maps, and synthesis consumes q_dec.

    def analysis(self, x, qp):
        """x (1, H, W, 3) in [0, 1] padded -> (y f32 UNSCALED, z_int8)."""
        from ..core.padding import pad_for_y
        y = self.enc(x, self._q(self.q_scale_enc, qp))
        z = self.hyper_enc(pad_for_y(y))  # RT video_model.py:311
        z_int8 = jnp.clip(jnp.round(z.astype(jnp.float32)),
                          -128, 127).astype(jnp.int8)
        return y.astype(jnp.float32), z_int8

    def prior0(self, z_int8, yh, yw):
        z_hat = z_int8.astype(self.dtype)
        # crop the 4-aligned hyper grid to the (possibly odd) y grid
        # BEFORE fusion (reference crop_hyper_params)
        hyper = self.hyper_dec(z_hat)[:, :yh, :yw, :]
        params = self.y_prior_fusion(hyper)
        q_enc, q_dec, scales, means = separate_prior_rt_image(params)
        ctx = self.y_spatial_prior_reduction(params)
        return scales, means, ctx, q_enc, q_dec

    def prior_step(self, ctx, y_hat_so_far, step):
        adaptors = [self.y_spatial_prior_adaptor_1,
                    self.y_spatial_prior_adaptor_2,
                    self.y_spatial_prior_adaptor_3]
        sp_in = jnp.concatenate([y_hat_so_far.astype(self.dtype), ctx],
                                axis=-1)
        out = self.y_spatial_prior(adaptors[step - 1](sp_in))
        scales, means = jnp.split(out, 2, axis=-1)
        return scales, means

    def synthesis(self, y_hat_so_far, q_dec, qp, out_h, out_w):
        """y_hat sum * hyper q_dec -> [0,1]-clamped recon crop."""
        y_hat = (y_hat_so_far * q_dec).astype(self.dtype)
        x_hat = self.dec(y_hat, self._q(self.q_scale_dec, qp))
        x_hat = jnp.clip(x_hat.astype(jnp.float32), 0.0, 1.0)
        return x_hat[:, :out_h, :out_w, :]
