"""DMC HT video codec (HTL / HTS variants) — DCVC-UF chunk-based coding.

Reference: src/models/video_model_ht.py.  Eight frames are coded jointly:
the chunk (24 input channels) is 8x pixel-unshuffled to 1536ch, fused with
a temporal context, and compressed into one y latent (256ch @ /16 of the
frame).  Temporal memory propagates across chunks through
FeatureAdaptorI/M + FeatureExtractor; the ReconHead holds 8 frame-specific
decoders (HTS shares 4 trunk blocks across frame pairs).

Variant difference that shapes the inference runtime (video_model_ht.py:281,
:468): HTS spatial priors emit means only, so every coding step's scale
index is known after the fused prior -> ONE entropy pass decodes all y
symbols; HTL priors emit scales+means -> 4-step interleaved decode ladder.

Stage methods mirror dmci.py: shared executables between encode and decode
guarantee bit-identical priors.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.shuffle import pixel_shuffle, pixel_unshuffle
from ..layers.blocks import (
    Conv1x1, Conv3x3, DepthConvBlock, ResidualBlockUpsample,
    ResidualBlockWithStride2, StackedDCB, SubpelConv2x,
)
from . import common


@dataclasses.dataclass(frozen=True)
class DMCHTConfig:
    is_hts: bool = True
    frame_delay: int = 8
    ch_src_intra: int = 3 * 8 * 8   # 192: one unshuffled frame
    ch_y: int = 256
    ch_z: int = 128
    ch_d: int = 512
    ch_m: int = 512
    ch_recon: int = 256
    qp_num: int = 64
    # trunk depths (DCB counts)
    enc_depth: int = 6
    dec_depth: int = 7
    fa_i_depth: int = 4
    fa_m_depth: int = 6
    fx_depth: int = 5
    recon_shared_depth: int = 1     # HTS conv1 blocks per pair
    recon_depth: int = 3            # per-frame DCBs before the head conv

    @property
    def ch_src_d(self):
        return self.ch_src_intra * self.frame_delay

    @property
    def dcb2(self):
        return self.is_hts


HTS_CONFIG = DMCHTConfig(is_hts=True)
HTL_CONFIG = DMCHTConfig(is_hts=False, enc_depth=7, dec_depth=11,
                         fa_i_depth=3, fa_m_depth=10, fx_depth=2,
                         recon_depth=5)
TINY_HT_CONFIG = DMCHTConfig(is_hts=True, ch_y=16, ch_z=8, ch_d=32,
                             ch_m=32, ch_recon=16, qp_num=8,
                             enc_depth=1, dec_depth=1, fa_i_depth=1,
                             fa_m_depth=1, fx_depth=1, recon_depth=1)
TINY_HTL_CONFIG = DMCHTConfig(is_hts=False, ch_y=16, ch_z=8, ch_d=32,
                              ch_m=32, ch_recon=16, qp_num=8,
                              enc_depth=1, dec_depth=1, fa_i_depth=1,
                              fa_m_depth=1, fx_depth=1, recon_depth=1)
# mid-size config for trained quality gates (see dmci.SMALL_CONFIG)
SMALL_HT_CONFIG = DMCHTConfig(is_hts=True, ch_y=64, ch_z=32, ch_d=128,
                              ch_m=128, ch_recon=64, qp_num=16,
                              enc_depth=2, dec_depth=2, fa_i_depth=1,
                              fa_m_depth=2, fx_depth=2, recon_depth=1)


def _dcb_stack(x, chs, dcb2, dtype, name):
    """Sequential DepthConvBlocks; chs = [(in, out), ...]."""
    for i, (ci, co) in enumerate(chs):
        x = DepthConvBlock(ci, co, dcb2=dcb2, dtype=dtype,
                           name=f"{name}_{i}")(x)
    return x


class HTEncoder(nn.Module):
    cfg: DMCHTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, quant_step):
        c = self.cfg
        feature = pixel_unshuffle(x, 8)
        feature = jnp.concatenate([feature, ctx], axis=-1)
        chs = [(c.ch_src_d + c.ch_d, c.ch_d)] + [(c.ch_d, c.ch_d)] * (c.enc_depth - 1)
        feature = _dcb_stack(feature, chs, c.dcb2, self.dtype, "conv1")
        feature = feature * quant_step
        return Conv3x3(c.ch_y, stride=2, dtype=self.dtype, name="down")(feature)


class HTDecoder(nn.Module):
    cfg: DMCHTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y_hat, ctx, quant_step):
        c = self.cfg
        if c.is_hts:
            feature = SubpelConv2x(c.ch_d, 1, dtype=self.dtype, name="up")(y_hat)
        else:
            feature = SubpelConv2x(c.ch_d, 3, force_bias=True,
                                   dtype=self.dtype, name="up")(y_hat)
        feature = jnp.concatenate([feature, ctx], axis=-1)
        chs = [(c.ch_d * 2, c.ch_d)] + [(c.ch_d, c.ch_d)] * (c.dec_depth - 1)
        feature = _dcb_stack(feature, chs, c.dcb2, self.dtype, "conv1")
        return feature * quant_step


class HTFeatureAdaptorI(nn.Module):
    cfg: DMCHTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        chs = [(c.ch_src_intra, c.ch_m)] + [(c.ch_m, c.ch_m)] * (c.fa_i_depth - 1)
        return _dcb_stack(x, chs, c.dcb2, self.dtype, "conv")


class HTFeatureAdaptorM(nn.Module):
    cfg: DMCHTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, feature):
        c = self.cfg
        x = jnp.concatenate([memory, feature], axis=-1)
        chs = [(c.ch_m + c.ch_d, c.ch_m)] + [(c.ch_m, c.ch_m)] * (c.fa_m_depth - 1)
        return _dcb_stack(x, chs, c.dcb2, self.dtype, "conv")


class HTFeatureExtractor(nn.Module):
    cfg: DMCHTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        chs = [(c.ch_m, c.ch_d)] + [(c.ch_d, c.ch_d)] * (c.fx_depth - 1)
        return _dcb_stack(x, chs, c.dcb2, self.dtype, "conv")


class HTHyperEncoder(nn.Module):
    cfg: DMCHTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        c = self.cfg
        kw = {"shortcut": False} if c.is_hts else {}
        x = DepthConvBlock(c.ch_y, c.ch_y, dtype=self.dtype, name="conv_0")(y)
        x = ResidualBlockWithStride2(c.ch_y, c.ch_y, dtype=self.dtype,
                                     name="conv_1", **kw)(x)
        return ResidualBlockWithStride2(c.ch_y, c.ch_z, dtype=self.dtype,
                                        name="conv_2", **kw)(x)


class HTHyperDecoder(nn.Module):
    cfg: DMCHTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_hat):
        c = self.cfg
        kw = {"shortcut": False} if c.is_hts else {"force_bias": True}
        x = ResidualBlockUpsample(c.ch_z, c.ch_y, dtype=self.dtype,
                                  name="conv_0", **kw)(z_hat)
        x = ResidualBlockUpsample(c.ch_y, c.ch_y, dtype=self.dtype,
                                  name="conv_1", **kw)(x)
        return DepthConvBlock(c.ch_y, c.ch_y, dtype=self.dtype, name="conv_2")(x)


class HTTemporalPriorEncoder(nn.Module):
    cfg: DMCHTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, quant):
        c = self.cfg
        kw = {"shortcut": False} if c.is_hts else {}
        return ResidualBlockWithStride2(c.ch_d, c.ch_y * 2, dtype=self.dtype,
                                        name="conv", **kw)(memory * quant)


class HTPriorFusion(nn.Module):
    cfg: DMCHTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hyper_params, temporal_params):
        cy = self.cfg.ch_y
        x = jnp.concatenate([hyper_params, temporal_params], axis=-1)
        for i in range(3):
            x = DepthConvBlock(cy * 3, cy * 3, dtype=self.dtype,
                               name=f"conv_{i}")(x)
        return Conv1x1(cy * 3, dtype=self.dtype, name="conv_3")(x)


class HTSpatialPrior(nn.Module):
    cfg: DMCHTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cy = self.cfg.ch_y
        out_ch = cy if self.cfg.is_hts else cy * 2
        for i in range(3):
            x = DepthConvBlock(cy * 2, cy * 2, dtype=self.dtype,
                               name=f"conv_{i}")(x)
        return Conv1x1(out_ch, dtype=self.dtype, name="conv_3")(x)


class HTReconHead(nn.Module):
    """8 frame-specific decoders evaluated as STACKED batched DCB chains
    (reference runs them sequentially, video_model_ht.py:215-275); HTS
    shares 4 trunks across frame pairs.

    Returns the stacked pre-shuffle head outputs (F, B, h, w, 192); the
    caller pixel-shuffles.  The reset path re-seeds the DPB with the last
    frame's head output (video_model_ht.py:406-411)."""
    cfg: DMCHTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        fd = c.frame_delay
        if c.is_hts:
            self.trunk = [StackedDCB(fd // 2, c.ch_d, c.ch_d,
                                     dtype=self.dtype)
                          for _ in range(c.recon_shared_depth)]
        heads = [StackedDCB(fd, c.ch_d, c.ch_recon, dtype=self.dtype)]
        heads += [StackedDCB(fd, c.ch_recon, c.ch_recon, dtype=self.dtype)
                  for _ in range(c.recon_depth - 1)]
        self.heads = heads
        winit = nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1,
            batch_axis=(0,))
        self.out_w = self.param("out_w", winit,
                                (fd, c.ch_recon, c.ch_src_intra),
                                jnp.float32)
        self.out_b = self.param("out_b", nn.initializers.zeros,
                                (fd, c.ch_src_intra), jnp.float32)

    def __call__(self, x, for_reset=False, phase_major=False, rows=None):
        """phase_major: emit head channels in (i*8+j)*3+c order (the
        packed-frame kernel's contract, kernels/depth_to_space.py) by
        permuting the OUTPUT WEIGHTS — free, and the stored param layout
        stays checkpoint-compatible.  The reset path always uses the
        torch order (the 192-ch seed feature feeds adaptor convs).

        rows=(lo, hi): evaluate only frames lo..hi (static, even bounds
        for HTS so shared trunk pairs stay intact) — the runtime slices
        the recon head so its dispatches fill the decode ladder's
        host-wait gaps."""
        c = self.cfg
        fd = c.frame_delay
        lo, hi = rows if rows is not None else (0, fd)
        dt = self.dtype
        x = x.astype(dt)
        if c.is_hts:
            assert lo % 2 == 0 and hi % 2 == 0, "HTS trunk pairs"
            xt = jnp.broadcast_to(x[None], ((hi - lo) // 2,) + x.shape)
            for blk in self.trunk:
                xt = blk(xt, rows=(lo // 2, hi // 2))
            xh = jnp.repeat(xt, 2, axis=0)
        else:
            xh = jnp.broadcast_to(x[None], (hi - lo,) + x.shape)
        for blk in self.heads:
            xh = blk(xh, rows=(lo, hi))
        out_w, out_b = self.out_w[lo:hi], self.out_b[lo:hi]
        if phase_major and not for_reset:
            from ..kernels.depth_to_space import phase_major_perm
            perm = phase_major_perm(8, 3)
            out_w = out_w[:, :, perm]
            out_b = out_b[:, perm]
        out = jnp.stack([
            jax.lax.dot_general(xh[s], out_w[s].astype(dt),
                                (((3,), (0,)), ((), ())),
                                preferred_element_type=dt)
            + out_b[s].astype(dt)
            for s in range(hi - lo)])
        if for_reset:
            return out[-1]
        return out


class DMCHT(nn.Module):
    """Chunk-based video codec (reference DMC, video_model_ht.py:320-527)."""
    cfg: DMCHTConfig = HTS_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.feature_adaptor_i = HTFeatureAdaptorI(c, dtype=self.dtype)
        self.feature_adaptor_m = HTFeatureAdaptorM(c, dtype=self.dtype)
        self.feature_extractor = HTFeatureExtractor(c, dtype=self.dtype)
        self.encoder = HTEncoder(c, dtype=self.dtype)
        self.hyper_encoder = HTHyperEncoder(c, dtype=self.dtype)
        self.hyper_decoder = HTHyperDecoder(c, dtype=self.dtype)
        self.temporal_prior_encoder = HTTemporalPriorEncoder(c, dtype=self.dtype)
        self.y_prior_fusion = HTPriorFusion(c, dtype=self.dtype)
        self.y_spatial_prior_reduction = Conv1x1(c.ch_y, dtype=self.dtype)
        self.y_spatial_prior_adaptor_1 = DepthConvBlock(
            c.ch_y * 2, c.ch_y * 2, force_adaptor=True, dtype=self.dtype)
        self.y_spatial_prior_adaptor_2 = DepthConvBlock(
            c.ch_y * 2, c.ch_y * 2, force_adaptor=True, dtype=self.dtype)
        self.y_spatial_prior_adaptor_3 = DepthConvBlock(
            c.ch_y * 2, c.ch_y * 2, force_adaptor=True, dtype=self.dtype)
        self.y_spatial_prior = HTSpatialPrior(c, dtype=self.dtype)
        self.decoder = HTDecoder(c, dtype=self.dtype)
        self.recon_head = HTReconHead(c, dtype=self.dtype)

        # FM-style log ladder init so the rate spread across QPs is
        # structural from step 0 (see common.q_ladder_init)
        ones = nn.initializers.ones
        feat = common.q_ladder_init(0.5, 2.0)
        feat_inv = common.q_ladder_init(0.5, 2.0, inverse=True)
        self.q_encoder = self.param("q_encoder", feat, (c.qp_num, c.ch_d))
        self.q_decoder = self.param("q_decoder", feat_inv, (c.qp_num, c.ch_d))
        self.q_feature = self.param("q_feature", ones, (c.qp_num, c.ch_d))

        self.bit_estimator_z = common.BitEstimatorModule(c.qp_num, c.ch_z)

    def _q(self, table, qp):
        q = jnp.take(table, qp, axis=0).astype(self.dtype)
        if q.ndim == 2:
            q = q[:, None, None, :]
        return q

    # ----------------------------------------------------- temporal state

    def adaptor_i(self, ref_feature):
        """First P-chunk after a refresh: memory from the intra feature."""
        memory = self.feature_adaptor_i(ref_feature.astype(self.dtype))
        ctx = self.feature_extractor(memory)
        return memory, ctx

    def adaptor_m(self, memory, ref_feature):
        memory = self.feature_adaptor_m(memory.astype(self.dtype),
                                        ref_feature.astype(self.dtype))
        ctx = self.feature_extractor(memory)
        return memory, ctx

    def reset_feature(self, feature):
        """recon_head(for_reset) -> new DPB seed (video_model_ht.py:406-411)."""
        return self.recon_head(feature.astype(self.dtype), for_reset=True)

    # ------------------------------------------------------ shared stages

    def _prior_params(self, z_hat, memory, qp):
        temporal = self.temporal_prior_encoder(memory,
                                               self._q(self.q_feature, qp))
        # hyper lives on the 4-aligned grid; crop to the (possibly odd)
        # y grid BEFORE fusion (reference crop_hyper_params,
        # dmc_hts_proxy.cpp:524-526)
        hyper = self.hyper_decoder(z_hat)[
            :, :temporal.shape[1], :temporal.shape[2], :]
        return self.y_prior_fusion(hyper, temporal)

    def prior0(self, z_int8, memory, qp, yh, yw):
        """Shared enc/dec: fused prior -> per-position quant + step-0
        scales/means + reduced spatial context."""
        z_hat = z_int8.astype(self.dtype)
        params = self._prior_params(z_hat, memory.astype(self.dtype), qp)
        params = params[:, :yh, :yw, :]
        q_enc, q_dec, scales, means = common.separate_prior_video_infer(params)
        ctx = self.y_spatial_prior_reduction(params)
        return q_enc, q_dec, scales, means, ctx

    def prior_step(self, ctx, y_hat_so_far, step):
        adaptors = [self.y_spatial_prior_adaptor_1,
                    self.y_spatial_prior_adaptor_2,
                    self.y_spatial_prior_adaptor_3]
        sp_in = jnp.concatenate([y_hat_so_far.astype(self.dtype), ctx], axis=-1)
        out = self.y_spatial_prior(adaptors[step - 1](sp_in))
        if self.cfg.is_hts:
            return out  # means only
        scales, means = jnp.split(out, 2, axis=-1)
        return scales, means

    def analysis(self, x, ctx, qp):
        """Padded chunk (1, H, W, 3*frame_delay) -> (y, z_int8).

        y may sit on an odd grid (frames pad to 16); only the stride-2
        hyper path needs 4-alignment (reference pad_for_y,
        dmc_hts_proxy.cpp:519-526)."""
        from ..core.padding import pad_for_y
        y = self.encoder(x, ctx, self._q(self.q_encoder, qp))
        z = self.hyper_encoder(pad_for_y(y))
        z_int8 = jnp.clip(jnp.round(z.astype(jnp.float32)), -128, 127).astype(jnp.int8)
        return y, z_int8

    def synthesis_feature(self, y_hat, ctx, qp):
        """Final y_hat (already *q_dec) -> decoder feature (the DPB state).
        The encoder stops here: the reference encode path also keeps a
        feature-domain DPB and never runs the recon heads
        (video_model_ht.py:436-441 returns only bit_stream)."""
        return self.decoder(y_hat.astype(self.dtype), ctx,
                            self._q(self.q_decoder, qp))

    def recon_frames(self, feature, qp, out_h, out_w, frames=None):
        """Decode-only: recon heads -> (F, out_h, out_w*3) packed-RGB
        rows.

        Packed layout: a (F, h, w, 3) output tiles the 3-wide minor dim
        at ~2% lane utilization on TPU; merging (w, 3) keeps the minor
        dim lane-wide.  Row-major bytes are identical, so the host
        reshapes to (F, h, w, 3) as a free view.  Emission goes through
        the phase-major packed-frame path (kernels/depth_to_space.py,
        ~7x faster than the pixel-shuffle transpose chain).

        frames=(lo, hi): reconstruct only that frame slice — the runtime
        splits the recon head into slices whose dispatches fill the
        decode ladder's host-wait gaps (the role of the reference's
        graph/entropy interleave, dmc_htl_proxy.cpp:606-690)."""
        from ..kernels.depth_to_space import packed_frames
        out = self.recon_head(feature, phase_major=True, rows=frames)
        x = packed_frames(out[:, 0])
        return x[:, :out_h, :out_w * 3]

    def synthesis(self, y_hat, ctx, qp, out_h, out_w):
        feature = self.synthesis_feature(y_hat, ctx, qp)
        return self.recon_frames(feature, qp, out_h, out_w), feature

    # ------------------------------------------------------ training path

    def __call__(self, x, ref_feature, memory, qp, rng):
        """Training forward for one chunk (video_model_ht.py:452-496).

        x: (B, H, W, 3*frame_delay) chunk; ref_feature: (B, H/8, W/8, 192);
        memory: (B, H/8, W/8, ch_m) or None.
        Returns (result dict, new_ref_feature, new_memory).
        """
        c = self.cfg
        if memory is None:
            memory = self.feature_adaptor_i(ref_feature)
        else:
            memory = self.feature_adaptor_m(memory, ref_feature)
        ctx = self.feature_extractor(memory)

        y = self.encoder(x, ctx, self._q(self.q_encoder, qp))
        z = self.hyper_encoder(y)
        z_hat = common.ste_round(z)

        params = self._prior_params(z_hat, memory, qp)
        yh, yw = y.shape[1], y.shape[2]
        params = params[:, :yh, :yw, :]

        adaptors = [
            lambda a, b: self.y_spatial_prior_adaptor_1(
                jnp.concatenate([a, b], axis=-1)),
            lambda a, b: self.y_spatial_prior_adaptor_2(
                jnp.concatenate([a, b], axis=-1)),
            lambda a, b: self.y_spatial_prior_adaptor_3(
                jnp.concatenate([a, b], axis=-1)),
        ]
        if c.is_hts:
            y_res, y_q, y_hat, scales_hat = common.forward_prior_4x_train(
                y, None, None, params, self.y_spatial_prior_reduction,
                adaptors, self.y_spatial_prior,
                spatial_prior_has_scales=False)
        else:
            sp_adaptors = [self.y_spatial_prior_adaptor_1,
                           self.y_spatial_prior_adaptor_2,
                           self.y_spatial_prior_adaptor_3]
            y_res, y_q, y_hat, scales_hat = common.forward_prior_4x_train(
                y, None, None, params, self.y_spatial_prior_reduction,
                sp_adaptors, self.y_spatial_prior,
                spatial_prior_has_scales=True)

        feature = self.decoder(y_hat, ctx, self._q(self.q_decoder, qp))
        head_out = self.recon_head(feature)     # (F, B, h, w, 192)
        x_hat_list = [pixel_shuffle(head_out[i], 8)
                      for i in range(c.frame_delay)]

        rng_y, rng_z = jax.random.split(rng)
        y_for_bit = common.add_noise(y_res, rng_y)
        z_for_bit = common.add_noise(z, rng_z)
        bits_y = jnp.sum(common.get_y_bits(y_for_bit, scales_hat), axis=(1, 2, 3))
        probs_z = self.bit_estimator_z.get_prob(z_for_bit, qp)
        bits_z = jnp.sum(common.probs_to_bits(probs_z), axis=(1, 2, 3))

        x_frames = jnp.split(x, c.frame_delay, axis=-1)
        mse_list = [common.get_mse(xf, xh)
                    for xf, xh in zip(x_frames, x_hat_list)]

        pixel_num = x.shape[1] * x.shape[2]
        bpp = (bits_y + bits_z) / pixel_num
        result = {
            "bits_y": bits_y,
            "bits_z": bits_z,
            "bpp": bpp,
            "mse": mse_list,
            "x_hat": x_hat_list,
        }
        return result, feature, memory
