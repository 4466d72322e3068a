"""Shared compression-model machinery.

Re-expresses CompressionModel (reference src/models/common_model.py) as
pure functions over NHWC tensors:
  * process_with_mask — training (STE) and inference (skip/clamp) variants
    (common_model.py:123-132 + the fused device kernel stream.cu:549-686)
  * forward_prior_4x / forward_prior_2x training passes
    (common_model.py:212-282)
  * RD loss utilities (utils/common.py:166-171, layers.py:34-60)
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.quant import ste_round, lower_bound, add_noise
from ..core.color import ycbcr2rgb
from ..core.masks import make_mask_2x, make_mask_4x
from ..entropy.bit_estimator import bit_estimator_z_fwd
from ..entropy.gaussian import (
    gaussian_prob_train, probs_to_bits, scale_to_index,
)

QP_NUM = 64


class BitEstimatorModule(nn.Module):
    """Trainable factorized z prior (reference BitEstimator,
    entropy_models.py:78-111) as a Flax module so its (h, b, a) banks live
    in the model param tree."""
    qp_num: int
    channel: int

    def setup(self):
        init = nn.initializers.normal(0.01)
        self.h = self.param("h", init, (self.qp_num, self.channel, 4))
        self.b = self.param("b", init, (self.qp_num, self.channel, 4))
        self.a = self.param("a", init, (self.qp_num, self.channel, 3))

    def get_prob(self, x, qp):
        """x: (B, H, W, C); qp: int or (B,)."""
        h = jnp.take(self.h, qp, axis=0)
        b = jnp.take(self.b, qp, axis=0)
        a = jnp.take(self.a, qp, axis=0)
        if h.ndim == 3:  # per-sample qp: (B, C, k) -> (B, 1, 1, C, k)
            h, b, a = h[:, None, None], b[:, None, None], a[:, None, None]
        return bit_estimator_z_fwd(x, h, b, a)


def process_with_mask_train(y, scales, means, mask):
    """Reference process_with_mask: STE round, no skip/clamp."""
    scales_hat = scales * mask
    means_hat = means * mask
    y_res = (y - means_hat) * mask
    y_q = ste_round(y_res)
    y_hat = y_q + means_hat
    return y_res, y_q, y_hat, scales_hat


def process_with_mask_infer(y, scales, means, mask, skip_thres):
    """Inference variant (stream.cu process_with_mask_kernel): f32 round,
    force-zero where masked scale <= skip_thres, clamp to int8 range.

    Returns (y_q f32-integral, y_hat, scales_hat, cond bool).
    """
    scales_hat = jnp.where(mask, scales, 0).astype(jnp.float32)
    means_hat = jnp.where(mask, means, 0).astype(jnp.float32)
    y_res = jnp.where(mask, y.astype(jnp.float32) - means_hat, 0)
    y_q = jnp.round(y_res)
    cond = scales_hat > skip_thres
    y_q = jnp.where(cond, y_q, 0.0)
    y_q = jnp.clip(y_q, -128.0, 127.0)
    y_hat = y_q + means_hat
    return y_q, y_hat, scales_hat, cond


def quantize_with_cond(y_scaled, means, mask, cond_flat):
    """Encoder-side quantization taking `cond` from the SHARED prior
    program (not recomputed from scales) so the coded/skip decision is
    identical to the decoder's by construction.  Returns int8 y_q
    (round residual, zero where not coded, clamp to int8 range —
    stream.cu:549-686 semantics)."""
    means_hat = jnp.where(mask, means, 0).astype(jnp.float32)
    y_res = jnp.where(mask, y_scaled.astype(jnp.float32) - means_hat, 0)
    y_q = jnp.round(y_res)
    cond = cond_flat.reshape(y_q.shape)
    y_q = jnp.where(cond, y_q, 0.0)
    y_q = jnp.clip(y_q, -128.0, 127.0)
    return y_q.astype(jnp.int8)


def build_combined_symbols(y_q, scales_hat, cond):
    """int16 combined symbol (y_q << 8 | scale_index) + bool cond, flattened
    NHWC (= the reference's channel-last flat order, stream.cu:89-175)."""
    idx = scale_to_index(scales_hat)  # int32 in [0,127]
    combined = (y_q.astype(jnp.int16) << 8) | idx.astype(jnp.int16)
    return combined.reshape(-1), idx.astype(jnp.uint8).reshape(-1), cond.reshape(-1)


def separate_prior_image(params):
    scales, means = jnp.split(params, 2, axis=-1)
    return scales, means


def separate_prior_video(params):
    quant_step, scales, means = jnp.split(params, 3, axis=-1)
    quant_step = lower_bound(quant_step, 0.5)
    q_enc = 1.0 / quant_step
    q_dec = quant_step
    return q_enc, q_dec, scales, means


def separate_prior_video_infer(params):
    quant_step, scales, means = jnp.split(params, 3, axis=-1)
    q_dec = jnp.maximum(quant_step.astype(jnp.float32), 0.5)
    return 1.0 / q_dec, q_dec, scales, means


def forward_prior_4x_train(y, q_enc, q_dec, params, reduction_fn,
                           adaptor_fns, spatial_prior_fn,
                           spatial_prior_has_scales=False):
    """Training-time quadtree 4-step prior pass (common_model.py:231-282).

    reduction_fn(params) -> common context; adaptor_fns[k](y_hat_so_far,
    common) -> adapted; spatial_prior_fn(adapted) -> means or scales+means.
    For the image codec q_enc/q_dec are the per-channel y quant vectors and
    the prior emits scales+means; for video (q_enc=None) they come from the
    fused prior params.
    """
    if q_enc is None:
        q_enc, q_dec, scales, means = separate_prior_video(params)
        y = y * q_enc
    else:
        spatial_prior_has_scales = True
        scales, means = separate_prior_image(params)
        y = y * q_enc

    common = reduction_fn(params)
    h, w, c = y.shape[-3:]
    masks = make_mask_4x(h, w, c)

    y_res_list, y_q_list, y_hat_list, s_hat_list = [], [], [], []
    y_hat_so_far = jnp.zeros_like(y)
    for step in range(4):
        if step > 0:
            if spatial_prior_has_scales:
                sp_in = jnp.concatenate([y_hat_so_far, common], axis=-1)
                out = spatial_prior_fn(adaptor_fns[step - 1](sp_in))
                scales, means = jnp.split(out, 2, axis=-1)
            else:
                means = spatial_prior_fn(
                    adaptor_fns[step - 1](y_hat_so_far, common))
        y_res, y_q, y_hat, s_hat = process_with_mask_train(
            y, scales, means, masks[step])
        y_hat_so_far = y_hat_so_far + y_hat
        y_res_list.append(y_res)
        y_q_list.append(y_q)
        y_hat_list.append(y_hat)
        s_hat_list.append(s_hat)

    y_hat = y_hat_so_far * q_dec
    y_res = (y_res_list[0] + y_res_list[1]) + (y_res_list[2] + y_res_list[3])
    y_q = (y_q_list[0] + y_q_list[1]) + (y_q_list[2] + y_q_list[3])
    scales_hat = (s_hat_list[0] + s_hat_list[1]) + (s_hat_list[2] + s_hat_list[3])
    return y_res, y_q, y_hat, scales_hat


def forward_prior_2x_train(y, params, spatial_prior_fn):
    """Training-time checkerboard 2-step pass (common_model.py:212-229)."""
    q_enc, q_dec, scales, means = separate_prior_video(params)
    y = y * q_enc
    h, w, c = y.shape[-3:]
    mask_0, mask_1 = make_mask_2x(h, w, c)

    y_res_0, y_q_0, y_hat_0, s_hat_0 = process_with_mask_train(
        y, scales, means, mask_0)
    means = spatial_prior_fn(y_hat_0, params)
    y_res_1, y_q_1, y_hat_1, s_hat_1 = process_with_mask_train(
        y, scales, means, mask_1)

    y_hat = (y_hat_0 + y_hat_1) * q_dec
    return (y_res_0 + y_res_1, y_q_0 + y_q_1, y_hat, s_hat_0 + s_hat_1)


# ------------------------------------------------------------------- loss

def get_mse_yuv_rgb(x, x_hat):
    """Per-channel YUV sums + RGB sum (reference get_mse_yuv_rgb).

    x, x_hat: (B, H, W, 3) YCbCr (centered at 0, i.e. value - 0.5 offsets
    cancel in the difference).
    """
    se = (x - x_hat) ** 2
    mse_yuv = jnp.sum(se, axis=(1, 2))  # (B, 3)
    org_rgb = ycbcr2rgb(x, clamp=False)
    rec_rgb = ycbcr2rgb(x_hat, clamp=False)
    mse_rgb = jnp.sum((org_rgb - rec_rgb) ** 2, axis=(1, 2, 3))  # (B,)
    return mse_yuv, mse_rgb


def mse_weighted_average(mse_yuv, mse_rgb, pixel_num):
    """Log-domain YUV 10:1:1 geometric mix, 0.8/0.2 YUV/RGB blend
    (reference mse_weighted_average, layers.py:48-60)."""
    dtype = mse_yuv.dtype
    mse_yuv = mse_yuv.astype(jnp.float32) / pixel_num
    mse_rgb = mse_rgb.astype(jnp.float32) / pixel_num
    mse_y = jnp.maximum(mse_yuv[:, 0], 1e-6)
    mse_u = jnp.maximum(mse_yuv[:, 1], 1e-6)
    mse_v = jnp.maximum(mse_yuv[:, 2], 1e-6)
    mix = jnp.exp(0.0833 * (10 * jnp.log(mse_y) + jnp.log(mse_u)
                            + jnp.log(mse_v))) * 3
    mse = mix * 0.8 + mse_rgb * 0.2
    return mse.astype(dtype)


def get_mse(x, x_hat):
    pixel_num = x.shape[1] * x.shape[2]
    mse_yuv, mse_rgb = get_mse_yuv_rgb(x, x_hat)
    return mse_weighted_average(mse_yuv, mse_rgb, pixel_num)


def mse_8frames_sum(mse_list, dist_weights):
    """Chunk loss weighting [odd/even/last] (reference mse_8frames_sum)."""
    return ((mse_list[0] + mse_list[2] + mse_list[4] + mse_list[6]) * dist_weights[1]
            + (mse_list[1] + mse_list[3] + mse_list[5]) * dist_weights[2]
            + mse_list[7] * dist_weights[0])


def loss_func(rd, lambdas):
    costs = lambdas * rd["mse"] + rd["bpp"]
    return {"losses": costs, "loss": jnp.mean(costs)}


def get_y_bits(y_noisy, scales_hat):
    return probs_to_bits(gaussian_prob_train(y_noisy, scales_hat))


def get_training_lambdas(lam_lo_hi, qp_num=QP_NUM):
    """Log-spaced lambda per QP (utils/common.py:184-187)."""
    return np.exp(np.linspace(np.log(lam_lo_hi[0]), np.log(lam_lo_hi[1]), qp_num))


def q_ladder_init(lo, hi, inverse=False):
    """Initializer for (qp_num, ch) quant-step banks: rows log-spaced
    lo -> hi along the QP axis (their reciprocals when `inverse`, for
    the decode banks that undo the encode step).

    The reference trains its per-QP q vectors from torch's default init
    and relies on scale + data to spread them; DCVC-FM instead makes the
    ladder STRUCTURAL via log-interpolation between min/max rows
    (DCVC-FM/src/models/common_model.py:37-60).  We keep per-QP free
    parameters (UF semantics) but seed them with the FM-style log ladder
    so the rate spread across QPs exists from step 0 — without it a
    short training run leaves every QP coding identical bits (all-ones
    rows get near-zero differential gradient early on).
    """
    def init(key, shape, dtype=jnp.float32):
        del key
        qp_num, ch = shape
        row = np.exp(np.linspace(np.log(lo), np.log(hi), qp_num))
        if inverse:
            row = 1.0 / row
        return jnp.asarray(np.repeat(row[:, None], ch, 1), dtype)
    return init
