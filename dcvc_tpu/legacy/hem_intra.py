"""IntraNoAR — the DCVC-HEM/DC/FM family intra (I-frame) codec.

Reference: DCVC-family/DCVC-HEM/src/models/image_model.py:15-100 (the
same architecture serves HEM, DC and FM eval conditions; FM widens N).
Residual conv enc/dec at /16 with a UNet refine head, hyper prior at
/64, dual cross-checkerboard spatial prior (gaussian), q_basic x
q_scale continuous rate control.

Stage methods match the EVC image codec's surface (analysis / prior /
spatial / synthesis), so the EVC bitstream runtime machinery drives it
(runtime/evc_codec.py IntraNoARCodec).
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.quant import ste_round, lower_bound
from ..entropy.gaussian import gaussian_prob_train, probs_to_bits
from ..models import common as mcommon
from .dcvc_hem import HEMUNet
from ..core.masks import _phase_np
from .fm_layers import ConvK, SubpelConv, lrelu


@dataclasses.dataclass(frozen=True)
class IntraNoARConfig:
    n: int = 192
    refine_ch: int = 16
    anchor_num: int = 4


INTRA_NOAR_CONFIG = IntraNoARConfig()
# FM's intra uses the same topology with N=256 (DCVC-FM image_model.py)
INTRA_NOAR_FM_CONFIG = IntraNoARConfig(n=256)
TINY_INTRA_NOAR_CONFIG = IntraNoARConfig(n=8, refine_ch=8)


class RBS(nn.Module):
    """ResidualBlockWithStride (HEM layers.py:42-73)."""
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvK(self.out_ch, stride=2, dtype=self.dtype, name="conv1")(x)
        h = lrelu(h, 0.01)
        h = ConvK(self.out_ch, dtype=self.dtype, name="conv2")(h)
        h = lrelu(h, 0.1)
        idn = ConvK(self.out_ch, kernel=1, stride=2, dtype=self.dtype,
                    name="downsample")(x)
        return h + idn


class RB(nn.Module):
    """ResidualBlock (HEM layers.py:104-131)."""
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvK(self.out_ch, dtype=self.dtype, name="conv1")(x)
        h = lrelu(h, 0.01)
        h = ConvK(self.out_ch, dtype=self.dtype, name="conv2")(h)
        h = lrelu(h, 0.01)
        return h + x


class RBU(nn.Module):
    """ResidualBlockUpsample (HEM layers.py:76-101)."""
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = SubpelConv(self.out_ch, r=2, kernel=1, dtype=self.dtype,
                       name="subpel_conv")(x)
        h = lrelu(h, 0.01)
        h = ConvK(self.out_ch, dtype=self.dtype, name="conv")(h)
        h = lrelu(h, 0.1)
        idn = SubpelConv(self.out_ch, r=2, kernel=1, dtype=self.dtype,
                         name="upsample")(x)
        return h + idn


class IntraNoAR(nn.Module):
    cfg: IntraNoARConfig = INTRA_NOAR_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c, d = self.cfg, self.dtype
        N = c.n
        self.enc = nn.Sequential([
            RBS(N, dtype=d), RB(N, dtype=d), RBS(N, dtype=d),
            RB(N, dtype=d), RBS(N, dtype=d), RB(N, dtype=d),
            ConvK(N, stride=2, dtype=d),
        ])
        self.dec = nn.Sequential([
            RB(N, dtype=d), RBU(N, dtype=d), RB(N, dtype=d),
            RBU(N, dtype=d), RB(N, dtype=d), RBU(N, dtype=d),
            RB(N, dtype=d),
            SubpelConv(c.refine_ch, r=2, kernel=1, dtype=d),
        ])
        self.refine_unet = HEMUNet(c.refine_ch, dtype=d)
        self.refine_out = ConvK(3, dtype=d)

        self.hyper_enc = nn.Sequential([
            ConvK(N, dtype=d), lambda x: lrelu(x, 0.01),
            ConvK(N, dtype=d), lambda x: lrelu(x, 0.01),
            ConvK(N, stride=2, dtype=d), lambda x: lrelu(x, 0.01),
            ConvK(N, dtype=d), lambda x: lrelu(x, 0.01),
            ConvK(N, stride=2, dtype=d),
        ])
        self.hyper_dec = nn.Sequential([
            ConvK(N, dtype=d), lambda x: lrelu(x, 0.01),
            SubpelConv(N, r=2, kernel=1, dtype=d),
            lambda x: lrelu(x, 0.01),
            ConvK(N * 3 // 2, dtype=d), lambda x: lrelu(x, 0.01),
            SubpelConv(N * 3 // 2, r=2, kernel=1, dtype=d),
            lambda x: lrelu(x, 0.01),
            ConvK(N * 2, dtype=d),
        ])
        self.y_prior_fusion = nn.Sequential([
            ConvK(N * 3, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(N * 3, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(N * 3, dtype=d),
        ])
        self.y_spatial_prior = nn.Sequential([
            ConvK(N * 3, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(N * 3, dtype=d), lambda x: lrelu(x, 0.2),
            ConvK(N * 2, dtype=d),
        ])

        ones = nn.initializers.ones
        self.q_basic = self.param("q_basic", ones, (1, 1, 1, N))
        self.q_scale = self.param("q_scale", ones, (c.anchor_num, 1, 1, 1))
        self.bit_estimator_z = mcommon.BitEstimatorModule(1, N)

    def _curr_q(self, q_scale):
        return (lower_bound(self.q_basic, 0.5) * q_scale).astype(self.dtype)

    def _refine(self, feat):
        return self.refine_out(self.refine_unet(feat))

    # ----------------------------------------- inference stage methods
    # (EVC-runtime-compatible surface, image_model.py:131-200)

    def analysis(self, x, q_scale):
        y = self.enc(x.astype(self.dtype)) / self._curr_q(q_scale)
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
        y_hat = y_hat_acc * self._curr_q(q_scale).astype(jnp.float32)
        x_hat = self._refine(self.dec(y_hat.astype(self.dtype)))
        return jnp.clip(x_hat.astype(jnp.float32), 0.0, 1.0)

    # ----------------------------------------------------------- forward

    def __call__(self, x, q_scale=None, rng=None):
        """Training forward (image_model.py:53-100).  x: (B, H, W, 3)
        RGB [0, 1]."""
        d = self.dtype
        if q_scale is None:
            q_scale = self.q_scale[0, 0, 0, 0]
        curr_q = self._curr_q(q_scale)

        y = self.enc(x.astype(d)) / curr_q
        z = self.hyper_enc(y)
        z_hat = ste_round(z)
        params = self.y_prior_fusion(self.hyper_dec(z_hat))
        q_step, scales, means = jnp.split(params, 3, axis=-1)

        # dual cross-checkerboard (common_model.py:102-145)
        b, h, w, cc = y.shape
        mask_0 = (_phase_np(h, w, 0, 0) | _phase_np(h, w, 1, 1))[None, :, :, None]
        mask_1 = ~mask_0
        q_step = jnp.maximum(q_step, 0.5)
        yq = y / q_step
        y_0, y_1 = jnp.split(yq, 2, axis=-1)
        s_0, s_1 = jnp.split(scales, 2, axis=-1)
        m_0, m_1 = jnp.split(means, 2, axis=-1)
        r00, q00, h00, sh00 = mcommon.process_with_mask_train(
            y_0, s_0, m_0, mask_0)
        r11, q11, h11, sh11 = mcommon.process_with_mask_train(
            y_1, s_1, m_1, mask_1)
        sp = jnp.concatenate(
            [h00, h11, means, scales,
             jnp.broadcast_to(q_step, yq.shape).astype(yq.dtype)], axis=-1)
        out = self.y_spatial_prior(sp)
        s_0, m_0, s_1, m_1 = jnp.split(out, 4, axis=-1)
        r01, q01, h01, sh01 = mcommon.process_with_mask_train(
            y_0, s_0, m_0, mask_1)
        r10, q10, h10, sh10 = mcommon.process_with_mask_train(
            y_1, s_1, m_1, mask_0)
        y_res = jnp.concatenate([r00 + r01, r11 + r10], axis=-1)
        y_q = jnp.concatenate([q00 + q01, q11 + q10], axis=-1)
        y_hat = jnp.concatenate([h00 + h01, h11 + h10], axis=-1) * q_step
        scales_hat = jnp.concatenate([sh00 + sh01, sh11 + sh10], axis=-1)

        y_hat = y_hat * curr_q
        x_hat = self._refine(self.dec(y_hat))
        x_hat_f = jnp.clip(x_hat.astype(jnp.float32), 0.0, 1.0)

        if rng is not None:
            y_for_bit = mcommon.add_noise(y_res, rng)
        else:
            y_for_bit = y_q
        bits_y = jnp.sum(probs_to_bits(
            gaussian_prob_train(y_for_bit, scales_hat)), axis=(1, 2, 3))
        probs_z = self.bit_estimator_z.get_prob(z_hat, 0)
        bits_z = jnp.sum(probs_to_bits(probs_z), axis=(1, 2, 3))

        pixel_num = x.shape[1] * x.shape[2]
        mse = jnp.mean((x_hat_f - x.astype(jnp.float32)) ** 2,
                       axis=(1, 2, 3))
        return {
            "x_hat": x_hat_f,
            "bpp_y": bits_y / pixel_num,
            "bpp_z": bits_z / pixel_num,
            "bpp": (bits_y + bits_z) / pixel_num,
            "mse": mse,
        }
