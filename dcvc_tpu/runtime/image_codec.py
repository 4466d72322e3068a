"""DMCI inference runtime: the TPU-native counterpart of the reference
DMCIProxy (src/layers/extensions/inference/dmci_proxy.cpp).

Architecture:
  * stage programs compiled per padded resolution; QP is a traced argument
    (one executable serves all 64 QPs, replacing the reference's 64
    CUDA graphs per resolution).
  * the prior programs (prior0 / prior_step) are the SAME executables in
    the encode and decode ladders, guaranteeing bit-identical scales/means
    on both sides (the reference achieves this by reusing CUDA kernels).
  * entropy coding runs on host worker threads (rans/) overlapped with
    device work: encode dispatches the reconstruction program before the
    rANS flush is awaited, mirroring the enc_0 / enc_1 graph overlap
    (dmci_proxy.cpp:296-421).
  * symbols cross the device->host boundary full-size with static shapes
    (int16 combined / uint8 index / bool cond) and are compacted on host,
    replacing the reference's device stream-compaction kernels.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import make_mask_4x
from ..core.padding import get_padding_size
from ..entropy.bit_estimator import BitEstimator
from ..entropy.gaussian import GaussianConditional, scale_to_index
from ..models import common as mcommon
from ..models.dmci import DMCI, DMCIConfig
from .. import rans


class DMCICodec:
    """Holds model params + CDF banks + compiled-program cache and
    implements compress/decompress against the NAL bitstream payload."""

    def __init__(self, params, cfg=None, skip_thres=0.0, dtype=jnp.bfloat16):
        self.cfg = cfg or DMCIConfig()
        self.model = DMCI(cfg=self.cfg, dtype=dtype)
        self.params = params
        self.dtype = dtype
        self.skip_thres = float(skip_thres)

        # CDF banks (reference CompressionModel.update + add_cdf_to_state_dict)
        be = BitEstimator(self.cfg.qp_num, self.cfg.ch_z)
        z_cdf, z_len = be.compute_cdf_bank(params["bit_estimator_z"], 8)
        g = GaussianConditional(skip_thres)
        y_cdf, y_len = g.compute_cdf_bank()

        self.encoder = rans.RansEncoder()
        self.decoder = rans.RansDecoder()
        for coder in (self.encoder, self.decoder):
            coder.set_cdf(z_cdf, z_len, 0)
            coder.set_cdf(y_cdf, y_len, 1)

        self._programs = {}

    @classmethod
    def init_random(cls, rng=None, cfg=None, dtype=jnp.bfloat16, **kwargs):
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or DMCIConfig()
        model = DMCI(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        # jit the init: one compile instead of hundreds of eager per-op
        # dispatches (which crawl on high-latency dispatch paths)
        init_fn = jax.jit(lambda r1, r2: model.init({"params": r1}, x, 0, r2))
        variables = init_fn(rng, jax.random.PRNGKey(1))
        return cls(jax.tree.map(np.asarray, variables["params"]),
                   cfg=cfg, dtype=dtype, **kwargs)

    # ------------------------------------------------------------ programs

    def _get_programs(self, h, w):
        """Compile (or fetch) the stage programs for padded size (h, w)."""
        key = (h, w)
        if key in self._programs:
            return self._programs[key]

        pad_r, pad_b = get_padding_size(h, w, 64)
        ph, pw = h + pad_b, w + pad_r
        yh, yw = ph // 16, pw // 16
        zh, zw = ph // 64, pw // 64
        masks = make_mask_4x(yh, yw, self.cfg.ch_y)
        ch_y = self.cfg.ch_y
        variables = {"params": self.params}
        model = self.model
        skip = self.skip_thres

        @jax.jit
        def analysis(x, qp):
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)), mode="edge")
            return model.apply(variables, x.astype(model.dtype), qp,
                               method=DMCI.analysis)

        @jax.jit
        def prior0(z_int8):
            return model.apply(variables, z_int8, yh, yw, method=DMCI.prior0)

        def _prior_step(step):
            @jax.jit
            def fn(ctx, y_hat_so_far):
                return model.apply(variables, ctx, y_hat_so_far, step,
                                   method=DMCI.prior_step)
            return fn

        def _enc_step(step):
            mask = masks[step]

            @jax.jit
            def fn(y_scaled, scales, means, y_hat_so_far):
                y_q, y_hat, s_hat, cond = mcommon.process_with_mask_infer(
                    y_scaled, scales, means, mask, skip)
                combined, _, cond_flat = mcommon.build_combined_symbols(
                    y_q, s_hat, cond)
                return combined, cond_flat, y_hat_so_far + y_hat
            return fn

        def _dec_idx(step):
            mask = masks[step]

            @jax.jit
            def fn(scales):
                s_hat = jnp.where(mask, scales, 0).astype(jnp.float32)
                idx = scale_to_index(s_hat).astype(jnp.uint8)
                cond = s_hat > skip
                return idx.reshape(-1), cond.reshape(-1)
            return fn

        def _dec_step(step):
            mask = masks[step]

            @jax.jit
            def fn(y_q_flat, means, y_hat_so_far):
                y_q = y_q_flat.reshape(1, yh, yw, ch_y).astype(jnp.float32)
                means_hat = jnp.where(mask, means, 0).astype(jnp.float32)
                return y_hat_so_far + (y_q + means_hat)
            return fn

        @jax.jit
        def synthesis(y_hat_so_far, qp):
            return model.apply(variables, y_hat_so_far, qp, h, w,
                               method=DMCI.synthesis)

        progs = {
            "analysis": analysis,
            "prior0": prior0,
            "prior_step": [_prior_step(k) for k in (1, 2, 3)],
            "enc_step": [_enc_step(k) for k in range(4)],
            "dec_idx": [_dec_idx(k) for k in range(4)],
            "dec_step": [_dec_step(k) for k in range(4)],
            "synthesis": synthesis,
            "dims": (ph, pw, yh, yw, zh, zw),
        }
        self._programs[key] = progs
        return progs

    # ------------------------------------------------------------- encode

    def compress(self, x, qp, h=None, w=None):
        """x: (1, H, W, 3) float32 NHWC in [-0.5, 0.5] (unpadded).

        Returns dict(bit_stream, x_hat, ec_parallel) like the reference
        DMCI.compress (image_model.py:194-212).
        """
        assert 0 <= int(qp) < self.cfg.qp_num, f"qp {qp} out of range"
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        qp_arr = jnp.int32(qp)

        y_scaled, z_int8 = p["analysis"](x, qp_arr)
        scales, means, ctx = p["prior0"](z_int8)

        y_hat_so_far = jnp.zeros((1,) + y_scaled.shape[1:], jnp.float32)
        step_out = []
        for k in range(4):
            combined, cond, y_hat_so_far = p["enc_step"][k](
                y_scaled, scales, means, y_hat_so_far)
            step_out.append((combined, cond))
            if k < 3:
                scales, means = p["prior_step"][k](ctx, y_hat_so_far)

        # dispatch reconstruction; overlaps with host entropy coding below
        x_hat = p["synthesis"](y_hat_so_far, qp_arr)

        # host entropy pipeline (reverse step order, then z)
        coded = []
        total = 0
        for k in range(3, -1, -1):
            combined, cond = step_out[k]
            c = rans.compact_i16(np.asarray(combined), np.asarray(cond))
            coded.append(c)
            total += c.size
        ec_parallel = rans.compute_ec_parallel(total)
        self.encoder.reset()
        self.encoder.set_parallel(ec_parallel)
        for c in coded:
            self.encoder.encode_y(c)
        z_np = np.asarray(z_int8).reshape(-1)
        ch_z = self.cfg.ch_z
        self.encoder.encode_z(z_np, int(qp) * ch_z, ch_z)
        self.encoder.flush()
        stream = self.encoder.get_encoded_stream()

        return {
            "bit_stream": stream,
            "x_hat": x_hat,
            "ec_parallel": ec_parallel,
        }

    # ------------------------------------------------------------- decode

    def decompress(self, bit_stream, qp, h, w, ec_part):
        """Returns dict(x_hat) with x_hat (1, h, w, 3) f32 in [-0.5, 0.5]."""
        assert 0 <= int(qp) < self.cfg.qp_num, f"qp {qp} out of range"
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        qp_arr = jnp.int32(qp)

        ch_z, ch_y = self.cfg.ch_z, self.cfg.ch_y
        self.decoder.set_parallel(ec_part)
        self.decoder.set_stream(bit_stream)
        z_num = zh * zw * ch_z
        self.decoder.decode_z(z_num, int(qp) * ch_z, ch_z)
        z_int8 = jnp.asarray(self.decoder.get_decoded().reshape(1, zh, zw, ch_z))

        scales, means, ctx = p["prior0"](z_int8)
        y_hat_so_far = jnp.zeros((1, yh, yw, ch_y), jnp.float32)
        for k in range(4):
            idx, cond = p["dec_idx"][k](scales)
            idx_np, cond_np = np.asarray(idx), np.asarray(cond)
            coded_idx = rans.compact_u8(idx_np, cond_np)
            self.decoder.decode_y(coded_idx)
            y_q = rans.scatter_i8(self.decoder.get_decoded(), cond_np)
            y_hat_so_far = p["dec_step"][k](jnp.asarray(y_q), means, y_hat_so_far)
            if k < 3:
                scales, means = p["prior_step"][k](ctx, y_hat_so_far)

        x_hat = p["synthesis"](y_hat_so_far, qp_arr)
        return {"x_hat": x_hat}
