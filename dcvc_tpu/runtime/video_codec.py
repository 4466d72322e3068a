"""Video codec inference runtime — the TPU-native counterpart of the
reference DMCHTSProxy / DMCHTLProxy / DMCLDProxy
(src/layers/extensions/inference/dmc_hts_proxy.cpp etc.).

Persistent DPB state (ref_feature / memory) lives as device arrays on the
codec object; each frame/chunk runs a chain of per-resolution compiled
programs.  As in image_codec.py, the prior programs are shared executables
between encode and decode, which makes their scales/means bit-identical.

Entropy strategy by variant (SURVEY.md 2.2.B):
  * HTS / LD (means-only spatial priors): every coding step's scale index
    is derivable right after the fused prior, so all y symbols are coded
    in ONE entropy pass (single shard) -> single host round-trip.
  * HTL (scales+means priors): 4-step interleaved ladder like the image
    codec.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import make_mask_2x, make_mask_4x
from ..core.padding import get_padding_size
from ..core.shuffle import pixel_unshuffle
from ..entropy.bit_estimator import BitEstimator
from ..entropy.gaussian import GaussianConditional, scale_to_index
from ..models import common as mcommon
from .. import rans


class VideoCodecBase:
    """Shared runtime for DMCHT (hts/htl) and DMCLD."""

    def __init__(self, model, params, skip_thres=0.0):
        self.model = model
        self.cfg = model.cfg
        self.params = params
        self.skip_thres = float(skip_thres)

        # HT configs carry is_hts; LD does not (2-step checkerboard)
        self.steps = 4 if hasattr(self.cfg, "is_hts") else 2
        is_hts = getattr(self.cfg, "is_hts", True)
        self.single_pass = (self.steps == 2) or is_hts
        self.frame_delay = self.cfg.frame_delay

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
        self.clear_dpb()

    # --------------------------------------------------------- DPB state

    def clear_dpb(self):
        self.ref_feature = None
        self.memory = None

    def add_ref_feature_from_frame(self, frame, h=None, w=None):
        """frame: (1, H, W, 3) in [-0.5, 0.5] (e.g. intra reconstruction).
        Pads and 8x-unshuffles it into the DPB seed feature
        (video_model_ht.py:413-415)."""
        frame = jnp.asarray(frame)
        h = frame.shape[1] if h is None else h
        w = frame.shape[2] if w is None else w
        p = self._get_programs(h, w)
        self.ref_feature = p["seed_ref"](frame)
        self.memory = None

    # ---------------------------------------------------------- programs

    def _get_programs(self, h, w):
        key = (h, w)
        if key in self._programs:
            return self._programs[key]

        cfg = self.cfg
        pad_r, pad_b = get_padding_size(h, w, 64)
        ph, pw = h + pad_b, w + pad_r
        yh, yw = ph // 16, pw // 16
        zh, zw = ph // 64, pw // 64
        ch_y = cfg.ch_y
        if self.steps == 4:
            masks = make_mask_4x(yh, yw, ch_y)
        else:
            masks = make_mask_2x(yh, yw, ch_y)
        model = self.model
        variables = {"params": self.params}
        skip = self.skip_thres
        mdtype = model.dtype

        def _pad(x):
            return jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                           mode="edge")

        @jax.jit
        def seed_ref(frame):
            return pixel_unshuffle(_pad(frame).astype(mdtype), 8)

        @jax.jit
        def adaptor_i(ref):
            return model.apply(variables, ref, method=type(model).adaptor_i)

        @jax.jit
        def adaptor_m(memory, ref):
            return model.apply(variables, memory, ref,
                               method=type(model).adaptor_m)

        @jax.jit
        def analysis(x, ctx, qp):
            return model.apply(variables, _pad(x).astype(mdtype), ctx, qp,
                               method=type(model).analysis)

        @jax.jit
        def prior0(z_int8, memory, qp):
            return model.apply(variables, z_int8, memory, qp, yh, yw,
                               method=type(model).prior0)

        def _prior_step(step):
            @jax.jit
            def fn(spctx, y_hat_so_far):
                if self.steps == 4:
                    return model.apply(variables, spctx, y_hat_so_far, step,
                                       method=type(model).prior_step)
                return model.apply(variables, spctx, y_hat_so_far,
                                   method=type(model).prior_step)
            return fn

        @jax.jit
        def scale_y(y, q_enc):
            return (y.astype(jnp.float32) * q_enc.astype(jnp.float32))

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
        def finalize(y_hat_so_far, q_dec):
            return y_hat_so_far * q_dec.astype(jnp.float32)

        @jax.jit
        def synthesis(y_hat, ctx, qp):
            return model.apply(variables, y_hat, ctx, qp, h, w,
                               method=type(model).synthesis)

        @jax.jit
        def reset_feature(feature):
            return model.apply(variables, feature,
                               method=type(model).reset_feature)

        progs = {
            "seed_ref": seed_ref,
            "adaptor_i": adaptor_i,
            "adaptor_m": adaptor_m,
            "analysis": analysis,
            "prior0": prior0,
            "prior_step": [_prior_step(k) for k in range(1, self.steps)],
            "scale_y": scale_y,
            "enc_step": [_enc_step(k) for k in range(self.steps)],
            "dec_idx": [_dec_idx(k) for k in range(self.steps)],
            "dec_step": [_dec_step(k) for k in range(self.steps)],
            "finalize": finalize,
            "synthesis": synthesis,
            "reset_feature": reset_feature,
            "dims": (ph, pw, yh, yw, zh, zw),
        }
        self._programs[key] = progs
        return progs

    # ----------------------------------------------------------- helpers

    def _apply_adaptor(self, p):
        if self.memory is None:
            memory, ctx = p["adaptor_i"](self.ref_feature)
        else:
            memory, ctx = p["adaptor_m"](self.memory, self.ref_feature)
        return memory, ctx

    def _step_prior(self, p, k, spctx, y_hat_so_far, scales):
        """Returns (scales, means) for step k+1."""
        out = p["prior_step"][k](spctx, y_hat_so_far)
        if isinstance(out, tuple):
            return out  # HTL: new scales + means
        return scales, out  # means-only variants keep scales

    def _update_state(self, p, feature, reset_flag):
        if reset_flag:
            self.ref_feature = p["reset_feature"](feature)
            self.memory = None
        else:
            self.ref_feature = feature

    # ------------------------------------------------------------ encode

    def compress(self, x, qp, reset_feature_memory=False, h=None, w=None):
        """x: (1, H, W, 3*frame_delay) f32 in [-0.5, 0.5].

        Returns dict(bit_stream, x_hat (F, H, W, 3), ec_parallel)."""
        assert 0 <= int(qp) < self.cfg.qp_num, f"qp {qp} out of range"
        assert self.ref_feature is not None, "DPB empty: add a ref frame first"
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        qp_arr = jnp.int32(qp)

        memory, ctx = self._apply_adaptor(p)
        y, z_int8 = p["analysis"](x, ctx, qp_arr)
        q_enc, q_dec, scales, means, spctx = p["prior0"](z_int8, memory, qp_arr)
        y_scaled = p["scale_y"](y, q_enc)

        y_hat_so_far = jnp.zeros(y_scaled.shape, jnp.float32)
        step_out = []
        for k in range(self.steps):
            combined, cond, y_hat_so_far = p["enc_step"][k](
                y_scaled, scales, means, y_hat_so_far)
            step_out.append((combined, cond))
            if k < self.steps - 1:
                scales, means = self._step_prior(p, k, spctx, y_hat_so_far,
                                                 scales)

        y_hat = p["finalize"](y_hat_so_far, q_dec)
        x_hat, feature = p["synthesis"](y_hat, ctx, qp_arr)
        if not reset_feature_memory:
            self.memory = memory
        self._update_state(p, feature, reset_feature_memory)

        # host entropy pipeline (overlaps with synthesis dispatch above)
        coded = [rans.compact_i16(np.asarray(c), np.asarray(cd))
                 for c, cd in step_out]
        total = sum(c.size for c in coded)
        ec_parallel = rans.compute_ec_parallel(total)
        self.encoder.reset()
        self.encoder.set_parallel(ec_parallel)
        if self.single_pass:
            self.encoder.encode_y(np.concatenate(coded))
        else:
            for c in reversed(coded):
                self.encoder.encode_y(c)
        ch_z = self.cfg.ch_z
        self.encoder.encode_z(np.asarray(z_int8).reshape(-1),
                              int(qp) * ch_z, ch_z)
        self.encoder.flush()

        return {
            "bit_stream": self.encoder.get_encoded_stream(),
            "x_hat": x_hat,
            "ec_parallel": ec_parallel,
        }

    # ------------------------------------------------------------ decode

    def decompress(self, bit_stream, qp, h, w, ec_part,
                   reset_feature_memory=False):
        assert 0 <= int(qp) < self.cfg.qp_num, f"qp {qp} out of range"
        assert self.ref_feature is not None, "DPB empty: add a ref frame first"
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        ch_z, ch_y = self.cfg.ch_z, self.cfg.ch_y
        qp_arr = jnp.int32(qp)

        memory, ctx = self._apply_adaptor(p)

        self.decoder.set_parallel(ec_part)
        self.decoder.set_stream(bit_stream)
        z_num = zh * zw * ch_z
        self.decoder.decode_z(z_num, int(qp) * ch_z, ch_z)
        z_int8 = jnp.asarray(self.decoder.get_decoded().reshape(1, zh, zw, ch_z))

        q_enc, q_dec, scales, means, spctx = p["prior0"](z_int8, memory, qp_arr)
        y_hat_so_far = jnp.zeros((1, yh, yw, ch_y), jnp.float32)

        if self.single_pass:
            # all scale indexes known now: one entropy pass for all steps
            idx_cond = [p["dec_idx"][k](scales) for k in range(self.steps)]
            idx_np = [np.asarray(i) for i, _ in idx_cond]
            cond_np = [np.asarray(c) for _, c in idx_cond]
            coded_idx = np.concatenate(
                [rans.compact_u8(i, c) for i, c in zip(idx_np, cond_np)])
            self.decoder.decode_y(coded_idx)
            decoded = self.decoder.get_decoded()
            # split decoded symbols back into per-step full-size planes
            counts = [rans.count_cond(c) for c in cond_np]
            offsets = np.cumsum([0] + counts)
            for k in range(self.steps):
                y_q = rans.scatter_i8(decoded[offsets[k]:offsets[k + 1]],
                                      cond_np[k])
                y_hat_so_far = p["dec_step"][k](jnp.asarray(y_q), means,
                                                y_hat_so_far)
                if k < self.steps - 1:
                    scales, means = self._step_prior(p, k, spctx,
                                                     y_hat_so_far, scales)
        else:
            for k in range(self.steps):
                idx, cond = p["dec_idx"][k](scales)
                idx_np, cond_np = np.asarray(idx), np.asarray(cond)
                self.decoder.decode_y(rans.compact_u8(idx_np, cond_np))
                y_q = rans.scatter_i8(self.decoder.get_decoded(), cond_np)
                y_hat_so_far = p["dec_step"][k](jnp.asarray(y_q), means,
                                                y_hat_so_far)
                if k < self.steps - 1:
                    scales, means = self._step_prior(p, k, spctx,
                                                     y_hat_so_far, scales)

        y_hat = p["finalize"](y_hat_so_far, q_dec)
        x_hat, feature = p["synthesis"](y_hat, ctx, qp_arr)
        if not reset_feature_memory:
            self.memory = memory
        self._update_state(p, feature, reset_feature_memory)
        return {"x_hat": x_hat}


def _init_both_branches(model, x, ref_intra, ref_feat, memory, rng,
                        init_scale=1.0):
    """Flax only materializes params for executed branches; the temporal
    models branch on memory None/not-None (adaptor_i vs adaptor_m), so
    init both and merge the top-level param dicts.

    init_scale < 1 damps conv kernels so the untrained temporal
    recurrence (feature -> adaptor -> feature) stays bounded — needed
    only for random-weight smoke testing; trained models are stable.
    """
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    init_fn_i = jax.jit(lambda a, b: model.init({"params": a}, x, ref_intra,
                                                None, 0, b))
    init_fn_m = jax.jit(lambda a, b: model.init({"params": a}, x, ref_feat,
                                                memory, 0, b))
    p_i = dict(init_fn_i(r1, r2)["params"])
    p_m = dict(init_fn_m(r1, r4)["params"])
    for k, v in p_m.items():
        if k not in p_i:
            p_i[k] = v
    params = jax.tree.map(np.asarray, p_i)
    if init_scale != 1.0:
        def scale_kernels(path, leaf):
            if path[-1].key == "kernel":
                return leaf * init_scale
            return leaf
        params = jax.tree_util.tree_map_with_path(scale_kernels, params)
    return params


class DMCHTCodec(VideoCodecBase):
    @classmethod
    def init_random(cls, rng=None, cfg=None, dtype=jnp.bfloat16,
                    init_scale=1.0, **kwargs):
        from ..models.dmc_ht import DMCHT, HTS_CONFIG
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or HTS_CONFIG
        model = DMCHT(cfg=cfg, dtype=dtype)
        f = cfg.frame_delay
        x = jnp.zeros((1, 64, 64, 3 * f), dtype)
        ref_intra = jnp.zeros((1, 8, 8, cfg.ch_src_intra), dtype)
        ref_feat = jnp.zeros((1, 8, 8, cfg.ch_d), dtype)
        memory = jnp.zeros((1, 8, 8, cfg.ch_m), dtype)
        params = _init_both_branches(model, x, ref_intra, ref_feat, memory,
                                     rng, init_scale)
        return cls(model, params, **kwargs)


class DMCLDCodec(VideoCodecBase):
    @classmethod
    def init_random(cls, rng=None, cfg=None, dtype=jnp.bfloat16,
                    init_scale=1.0, **kwargs):
        from ..models.dmc_ld import DMCLD, LD_CONFIG
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or LD_CONFIG
        model = DMCLD(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        ref_intra = jnp.zeros((1, 8, 8, cfg.ch_src), dtype)
        ref_feat = jnp.zeros((1, 8, 8, cfg.ch_d), dtype)
        memory = jnp.zeros((1, 8, 8, cfg.ch_m), dtype)
        params = _init_both_branches(model, x, ref_intra, ref_feat, memory,
                                     rng, init_scale)
        return cls(model, params, **kwargs)
