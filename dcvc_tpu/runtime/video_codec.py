"""Video codec inference runtime — the TPU-native counterpart of the
reference DMCHTSProxy / DMCHTLProxy / DMCLDProxy
(src/layers/extensions/inference/dmc_hts_proxy.cpp etc.).

Persistent DPB state (ref_feature / memory) lives as device arrays on the
codec object.  Dispatch/transfer-optimized like image_codec.py:
  * ENCODE is one fused program per resolution (temporal adaptor ->
    analysis -> fused prior -> masked quant steps -> reconstruction +
    next DPB state), with on-device symbol compaction; the host fetches
    counts then bucket-sliced coded symbols.
  * DECODE for means-only variants (HTS / LD) needs ONE entropy pass:
    a first program derives every step's compacted scale indexes from the
    fused prior; after the host rANS decode, a second program runs the
    whole means ladder + reconstruction (2 device programs per chunk).
  * HTL (scales+means priors) runs the 4-step interleaved ladder.
  * reset_feature_memory folds the recon-head reset into the state
    update (reference reset graph variants).
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
from .image_codec import BUCKET, _round_bucket, compact_device, expand_device


class VideoCodecBase:
    """Shared runtime for DMCHT (hts/htl) and DMCLD."""

    def __init__(self, model, params, skip_thres=0.0):
        self.model = model
        self.cfg = model.cfg
        self.params = params
        self.skip_thres = float(skip_thres)

        # HT configs carry is_hts; LD does not (2-step checkerboard);
        # configs may also pin prior_steps / single_pass explicitly
        # (e.g. DCVC-RT: 2 steps with scales+means -> ladder decode)
        default_steps = 4 if hasattr(self.cfg, "is_hts") else 2
        self.steps = getattr(self.cfg, "prior_steps", default_steps)
        is_hts = getattr(self.cfg, "is_hts", True)
        self.single_pass = getattr(self.cfg, "single_pass",
                                   (self.steps == 2) or is_hts)
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
        n_sym = yh * yw * ch_y
        steps = self.steps
        if steps == 4:
            masks = make_mask_4x(yh, yw, ch_y)
        else:
            masks = make_mask_2x(yh, yw, ch_y)
        model = self.model
        variables = {"params": self.params}
        skip = self.skip_thres
        mdtype = model.dtype
        single_pass = self.single_pass

        def _pad(x):
            return jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                           mode="edge")

        def _apply(method, *args):
            return model.apply(variables, *args, method=method)

        def _adaptor(memory, ref):
            if memory is None:
                return _apply(type(model).adaptor_i, ref)
            return _apply(type(model).adaptor_m, memory, ref)

        def _prior_step(spctx, y_hat_so_far, step):
            if steps == 4:
                out = _apply(type(model).prior_step, spctx, y_hat_so_far,
                             step)
            else:
                out = _apply(type(model).prior_step, spctx, y_hat_so_far)
            return out

        def _step_prior(k, spctx, y_hat_so_far, scales):
            out = _prior_step(spctx, y_hat_so_far, k + 1)
            if isinstance(out, tuple):
                return out          # HTL: new scales + means
            return scales, out      # means-only variants keep scales

        def _build_idx(scales, mask):
            s_hat = jnp.where(mask, scales, 0).astype(jnp.float32)
            idx = scale_to_index(s_hat).astype(jnp.uint8).reshape(-1)
            cond = (s_hat > skip).reshape(-1)
            return idx, cond

        def _state_update(feature, reset):
            """(new_ref_feature, keep_memory) under the reset flag."""
            if reset:
                return _apply(type(model).reset_feature, feature)
            return feature

        @jax.jit
        def seed_ref(frame):
            return pixel_unshuffle(_pad(frame).astype(mdtype), 8)

        def _enc_all(has_memory, reset):
            @jax.jit
            def fn(x, memory, ref, qp):
                mem, ctx = _adaptor(memory if has_memory else None, ref)
                y, z_int8 = _apply(type(model).analysis,
                                   _pad(x).astype(mdtype), ctx, qp)
                q_enc, q_dec, scales, means, spctx = _apply(
                    type(model).prior0, z_int8, mem, qp, yh, yw)
                y_scaled = y.astype(jnp.float32) * q_enc.astype(jnp.float32)

                y_hat_so_far = jnp.zeros(y_scaled.shape, jnp.float32)
                combined_list, cond_list, counts = [], [], []
                for k in range(steps):
                    y_q, y_hat, s_hat, cond = mcommon.process_with_mask_infer(
                        y_scaled, scales, means, masks[k], skip)
                    combined, _, cond_flat = mcommon.build_combined_symbols(
                        y_q, s_hat, cond)
                    combined_list.append(combined)
                    cond_list.append(cond_flat)
                    counts.append(jnp.sum(cond_flat).astype(jnp.int32))
                    y_hat_so_far = y_hat_so_far + y_hat
                    if k < steps - 1:
                        scales, means = _step_prior(k, spctx, y_hat_so_far,
                                                    scales)
                y_hat = y_hat_so_far * q_dec.astype(jnp.float32)
                x_hat, feature = _apply(type(model).synthesis, y_hat, ctx,
                                        qp, h, w)
                new_ref = _state_update(feature, reset)
                if single_pass:
                    # one globally-compacted buffer in step order 0..n:
                    # one encode_y call <-> one decode_y call
                    sym, _ = compact_device(jnp.concatenate(combined_list),
                                            jnp.concatenate(cond_list))
                else:
                    sym = jnp.stack([compact_device(c, f)[0]
                                     for c, f in zip(combined_list,
                                                     cond_list)])
                return sym, jnp.stack(counts), z_int8, x_hat, new_ref, mem
            return fn

        def _dec_prior(has_memory):
            """Fused adaptor + prior; single-pass variants also emit every
            step's compacted indexes (one entropy pass)."""
            @jax.jit
            def fn(z_int8, memory, ref, qp):
                mem, ctx = _adaptor(memory if has_memory else None, ref)
                q_enc, q_dec, scales, means, spctx = _apply(
                    type(model).prior0, z_int8, mem, qp, yh, yw)
                if single_pass:
                    idxs, conds = [], []
                    for k in range(steps):
                        idx, cond = _build_idx(scales, masks[k])
                        idxs.append(idx)
                        conds.append(cond)
                    cond_all = jnp.concatenate(conds)
                    packed_idx, count = compact_device(
                        jnp.concatenate(idxs), cond_all)
                    return (q_dec, means, spctx, ctx, mem, packed_idx,
                            count, cond_all)
                idx, cond = _build_idx(scales, masks[0])
                packed_idx, count = compact_device(idx, cond)
                return (q_dec, scales, means, spctx, ctx, mem, packed_idx,
                        count, cond)
            return fn

        def _dec_ladder_single(reset):
            """Means-only variants: whole ladder + synthesis in one
            program after the single entropy pass."""
            @jax.jit
            def fn(decoded_padded, cond_all, means, spctx, ctx, q_dec, qp):
                y_q_all = expand_device(
                    decoded_padded.astype(jnp.float32), cond_all)
                y_q_steps = jnp.split(y_q_all, steps)
                y_hat_so_far = jnp.zeros((1, yh, yw, ch_y), jnp.float32)
                scales = None
                for k in range(steps):
                    y_q = y_q_steps[k].reshape(1, yh, yw, ch_y)
                    means_hat = jnp.where(masks[k], means, 0).astype(jnp.float32)
                    y_hat_so_far = y_hat_so_far + (y_q + means_hat)
                    if k < steps - 1:
                        _, means = _step_prior(k, spctx, y_hat_so_far, scales)
                y_hat = y_hat_so_far * q_dec.astype(jnp.float32)
                x_hat, feature = _apply(type(model).synthesis, y_hat, ctx,
                                        qp, h, w)
                return x_hat, _state_update(feature, reset)
            return fn

        def _dec_step_ladder(step):
            """HTL interleaved rung: scatter + accumulate + next prior +
            next compacted indexes."""
            mask = masks[step]
            last = step == steps - 1

            @jax.jit
            def fn(decoded_padded, cond, means, y_hat_so_far, spctx):
                y_q = expand_device(decoded_padded.astype(jnp.float32), cond)
                y_q = y_q.reshape(1, yh, yw, ch_y)
                means_hat = jnp.where(mask, means, 0).astype(jnp.float32)
                y_hat_so_far = y_hat_so_far + (y_q + means_hat)
                if last:
                    return y_hat_so_far
                scales, means_next = _prior_step(spctx, y_hat_so_far,
                                                 step + 1)
                idx, cond_next = _build_idx(scales, masks[step + 1])
                packed_idx, count = compact_device(idx, cond_next)
                return (y_hat_so_far, means_next, packed_idx, count,
                        cond_next)
            return fn

        def _dec_final(reset):
            @jax.jit
            def fn(y_hat_so_far, q_dec, ctx, qp):
                y_hat = y_hat_so_far * q_dec.astype(jnp.float32)
                x_hat, feature = _apply(type(model).synthesis, y_hat, ctx,
                                        qp, h, w)
                return x_hat, _state_update(feature, reset)
            return fn

        import functools

        @functools.lru_cache(maxsize=64)
        def slice_prog(bucket):
            return jax.jit(lambda b: jax.lax.slice(b, (0,), (bucket,)))

        progs = {
            "seed_ref": seed_ref,
            "enc_all": {(m, r): _enc_all(m, r)
                        for m in (False, True) for r in (False, True)},
            "dec_prior": {m: _dec_prior(m) for m in (False, True)},
            "dec_single": {r: _dec_ladder_single(r) for r in (False, True)},
            "dec_step": [_dec_step_ladder(k) for k in range(steps)],
            "dec_final": {r: _dec_final(r) for r in (False, True)},
            "slice": slice_prog,
            "dims": (ph, pw, yh, yw, zh, zw, n_sym),
        }
        self._programs[key] = progs
        return progs

    # ----------------------------------------------------------- helpers

    def _fetch_coded(self, p, packed, count, dtype=np.int16):
        c = int(count)
        n_sym = p["dims"][6]
        if c == 0:
            return np.empty(0, dtype)
        bucket = _round_bucket(c, packed.shape[0])
        return np.asarray(p["slice"](bucket)(packed))[:c]

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
        reset = bool(reset_feature_memory)

        has_memory = self.memory is not None
        memory_arg = self.memory if has_memory else self.ref_feature  # dummy
        sym, counts, z_int8, x_hat, new_ref, mem = \
            p["enc_all"][(has_memory, reset)](x, memory_arg,
                                              self.ref_feature, jnp.int32(qp))
        self.ref_feature = new_ref
        self.memory = None if reset else mem

        counts_np, z_np = jax.device_get((counts, z_int8))
        total = int(counts_np.sum())
        ec_parallel = rans.compute_ec_parallel(total)
        self.encoder.reset()
        self.encoder.set_parallel(ec_parallel)
        if self.single_pass:
            coded = self._fetch_coded(p, sym, total)
            self.encoder.encode_y(coded)
        else:
            for k in range(self.steps - 1, -1, -1):
                coded = self._fetch_coded(p, sym[k], counts_np[k])
                self.encoder.encode_y(coded)
        ch_z = self.cfg.ch_z
        self.encoder.encode_z(z_np.reshape(-1), int(qp) * ch_z, ch_z)
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
        ph, pw, yh, yw, zh, zw, n_sym = p["dims"]
        ch_z, ch_y = self.cfg.ch_z, self.cfg.ch_y
        qp_arr = jnp.int32(qp)
        reset = bool(reset_feature_memory)

        self.decoder.set_parallel(ec_part)
        self.decoder.set_stream(bit_stream)
        z_num = zh * zw * ch_z
        self.decoder.decode_z(z_num, int(qp) * ch_z, ch_z)
        z_int8 = jnp.asarray(self.decoder.get_decoded().reshape(1, zh, zw, ch_z))

        has_memory = self.memory is not None
        memory_arg = self.memory if has_memory else self.ref_feature  # dummy

        if self.single_pass:
            (q_dec, means, spctx, ctx, mem, packed_idx, count, cond_all) = \
                p["dec_prior"][has_memory](z_int8, memory_arg,
                                           self.ref_feature, qp_arr)
            c = int(count)
            if c > 0:
                idx_np = self._fetch_coded(p, packed_idx, c, np.uint8)
                self.decoder.decode_y(idx_np)
                decoded = self.decoder.get_decoded()
                bucket = _round_bucket(c, self.steps * n_sym)
                pad = np.zeros(bucket, np.int8)
                pad[:c] = decoded
            else:
                pad = np.zeros(BUCKET, np.int8)
            x_hat, new_ref = p["dec_single"][reset](
                jnp.asarray(pad), cond_all, means, spctx, ctx, q_dec, qp_arr)
        else:
            (q_dec, scales, means, spctx, ctx, mem, packed_idx, count,
             cond) = p["dec_prior"][has_memory](z_int8, memory_arg,
                                                self.ref_feature, qp_arr)
            y_hat_so_far = jnp.zeros((1, yh, yw, ch_y), jnp.float32)
            for k in range(self.steps):
                c = int(count)
                if c > 0:
                    idx_np = self._fetch_coded(p, packed_idx, c, np.uint8)
                    self.decoder.decode_y(idx_np)
                    decoded = self.decoder.get_decoded()
                    bucket = _round_bucket(c, n_sym)
                    pad = np.zeros(bucket, np.int8)
                    pad[:c] = decoded
                else:
                    pad = np.zeros(BUCKET, np.int8)
                out = p["dec_step"][k](jnp.asarray(pad), cond, means,
                                       y_hat_so_far, spctx)
                if k < self.steps - 1:
                    y_hat_so_far, means, packed_idx, count, cond = out
                else:
                    y_hat_so_far = out
            x_hat, new_ref = p["dec_final"][reset](y_hat_so_far, q_dec,
                                                   ctx, qp_arr)

        self.ref_feature = new_ref
        self.memory = None if reset else mem
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
