"""Video codec inference runtime — the TPU-native counterpart of the
reference DMCHTSProxy / DMCHTLProxy / DMCLDProxy
(src/layers/extensions/inference/dmc_hts_proxy.cpp etc.).

Persistent DPB state (ref_feature / memory) lives as device arrays on the
codec object.

Bit-exactness architecture (see image_codec.py): encoder and decoder call
the LITERALLY SAME compiled executables for every tensor that influences
symbol decisions or reconstruction — the temporal adaptor, the fused
prior, each ladder rung's means accumulation + next prior, and synthesis.
Only exact integer tensors (z int8, y_q int8) cross program boundaries.

Symbol-path architecture: quantization/entropy bookkeeping runs in the
packed "candidate domain" of each mask step (core/masks.py phase terms)
with sort-based compaction/expansion (runtime/symbols.py) instead of
scatter/gather, which are slow on TPU.

Program graphs:
  * means-only variants (HTS / LD) keep the reference's single-entropy-
    pass decode (dmc_hts_proxy.cpp:634-657): the shared prior program
    emits EVERY step's compacted indexes at once; after one host rANS
    pass the ladder is steps x small shared accumulate+prior programs.
  * scales+means variants (HTL, DCVC-RT) run the interleaved 4-step
    ladder (dmc_htl_proxy.cpp:606-690).
  * reset_feature_memory folds the recon-head reset into the shared
    final program (reference reset graph variants).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import (phase_terms_2x, phase_terms_4x, phase_split,
                          phase_merge, phase_valid, terms_key)
from ..core.padding import get_padding_size
from ..core.shuffle import pixel_unshuffle
from ..entropy.bit_estimator import BitEstimator
from ..entropy.gaussian import GaussianConditional, scale_to_index
from .. import rans
from .fetch import BUCKET, CodedFetcher, round_bucket as _round_bucket, \
    start_copies
from .symbols import (compact_idx, compact_vals, expand_from_pos,
                      quantize_candidate)


class VideoCodecBase:
    """Shared runtime for DMCHT (hts/htl) and DMCLD."""

    def __init__(self, model, params, skip_thres=0.0, max_ec=8,
                 device_ec=None):
        self.model = model
        self.cfg = model.cfg
        self.params = params
        self.skip_thres = float(skip_thres)
        # container formats may cap lane count (DCVC-RT: 1-bit ec_part)
        # or pin it sequence-wide (force_ec; RT SPS flag)
        self.max_ec = int(max_ec)
        self.force_ec = None

        # HT configs carry is_hts; LD does not (2-step checkerboard);
        # configs may also pin prior_steps / single_pass explicitly
        # (e.g. DCVC-RT: 2 steps with scales+means -> ladder decode)
        default_steps = 4 if hasattr(self.cfg, "is_hts") else 2
        self.steps = getattr(self.cfg, "prior_steps", default_steps)
        is_hts = getattr(self.cfg, "is_hts", True)
        self.single_pass = getattr(self.cfg, "single_pass",
                                   (self.steps == 2) or is_hts)
        self.frame_delay = self.cfg.frame_delay

        # DCVC-RT extends the banks by EXTRA_QP rows for its
        # module-bank qp_shift schedule (legacy/dcvc_rt.py:QP_SHIFT)
        self.qp_bank = getattr(self.cfg, "qp_bank", self.cfg.qp_num)
        be = BitEstimator(self.qp_bank, self.cfg.ch_z)
        z_cdf, z_len = be.compute_cdf_bank(params["bit_estimator_z"], 8)
        g = GaussianConditional(skip_thres)
        y_cdf, y_len = g.compute_cdf_bank()
        self.encoder = rans.RansEncoder()
        self.decoder = rans.RansDecoder()
        for coder in (self.encoder, self.decoder):
            coder.set_cdf(z_cdf, z_len, 0)
            coder.set_cdf(y_cdf, y_len, 1)
        self._z_bank = (z_cdf, z_len)
        self._y_bank = (y_cdf, y_len)

        # device entropy decode (rans/device_decode.py): the ladder's
        # rANS runs INSIDE jit, so decode is a pure async dispatch chain
        # with no blocking host round-trips.  Either path produces
        # bit-identical symbols (tests/test_device_decode.py), so x_hat
        # is identical.  OFF by default: the pure-XLA symbol loop
        # measures ~26 us/iteration on TPU (gather-latency bound), which
        # loses to the host coder even across a ~30 ms-RTT tunnel; it
        # becomes the default once the Pallas kernel replaces the XLA
        # while_loop.
        self.device_ec = bool(device_ec) if device_ec is not None else False

        self._programs = {}
        self._dec_programs = {}
        self._fetcher = CodedFetcher()
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
        # frames pad to 16 (reference test_video.py:187), so the latent
        # grid may be ODD; see image_codec._get_programs
        pad_r, pad_b = get_padding_size(h, w, 16)
        ph, pw = h + pad_b, w + pad_r
        yh, yw = ph // 16, pw // 16
        zh, zw = (yh + 3) // 4, (yw + 3) // 4
        h2e, w2e = (yh + 1) // 2, (yw + 1) // 2
        ch_y = cfg.ch_y
        steps = self.steps
        if steps == 4:
            terms = phase_terms_4x(ch_y)
            n_cand = h2e * w2e * ch_y
        else:
            terms = phase_terms_2x(ch_y)
            n_cand = h2e * w2e * 2 * ch_y
        valid = [phase_valid(yh, yw, terms_key(terms[k]))
                 for k in range(steps)]
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

        def _prior_step(spctx, y_hat_so_far, step):
            if steps == 4:
                out = _apply(type(model).prior_step, spctx, y_hat_so_far,
                             step)
            else:
                out = _apply(type(model).prior_step, spctx, y_hat_so_far)
            return out

        def _step_prior_means(k, spctx, y_hat_so_far):
            """Means-only variants: next step's means."""
            out = _prior_step(spctx, y_hat_so_far, k + 1)
            if isinstance(out, tuple):
                raise AssertionError("means-only path got scales+means")
            return out

        def _build_idx(scales, step):
            """Candidate-domain indexes + conditions for mask `step`."""
            sc = phase_split(scales, terms[step]).astype(jnp.float32)
            flat = sc.reshape(-1)
            idx = scale_to_index(flat).astype(jnp.uint8)
            cond = flat > skip
            if not valid[step].all():
                cond = cond & jnp.asarray(valid[step])
            return idx, cond

        def _state_update(feature, reset):
            """(new_ref_feature) under the reset flag."""
            if reset:
                return _apply(type(model).reset_feature, feature)
            return feature

        @jax.jit
        def seed_ref(frame):
            return pixel_unshuffle(_pad(frame).astype(mdtype), 8)

        def _adaptor_prog(has_memory):
            """SHARED enc+dec: temporal feature adaptor."""
            @jax.jit
            def fn(memory, ref):
                if has_memory:
                    return _apply(type(model).adaptor_m, memory, ref)
                return _apply(type(model).adaptor_i, ref)
            return fn

        @jax.jit
        def enc_analysis(x, ctx, qp):
            """Encoder-only: pad + analysis transform; z materialized as
            int8 (exact) before any shared consumer sees it."""
            y, z_int8 = _apply(type(model).analysis,
                               _pad(x).astype(mdtype), ctx, qp)
            return y.astype(jnp.float32), z_int8

        @jax.jit
        def prior(z_int8, mem, qp):
            """SHARED enc+dec: fused prior.  Single-pass variants emit
            every step's compacted indexes (one entropy pass)."""
            q_enc, q_dec, scales, means, spctx = _apply(
                type(model).prior0, z_int8, mem, qp, yh, yw)
            if single_pass:
                idxs, conds = [], []
                for k in range(steps):
                    idx, cond = _build_idx(scales, k)
                    idxs.append(idx)
                    conds.append(cond)
                cond_all = jnp.concatenate(conds)
                packed_idx, packed_pos, count = compact_idx(
                    jnp.concatenate(idxs), cond_all)
                return (q_enc, q_dec, means, spctx, packed_idx, packed_pos,
                        count, cond_all)
            idx, cond = _build_idx(scales, 0)
            packed_idx, packed_pos, count = compact_idx(idx, cond)
            return (q_enc, q_dec, means, spctx, packed_idx, packed_pos,
                    count, cond)

        def _enc_quant_single(step):
            """Encoder-only (single-pass): per-step candidate-domain
            quantization; cond comes from the shared prior program."""
            lo, hi = step * n_cand, (step + 1) * n_cand

            @jax.jit
            def fn(y, q_enc, means, cond_all):
                y_c = phase_split(y * q_enc.astype(jnp.float32),
                                  terms[step])
                m_c = phase_split(means, terms[step]).astype(jnp.float32)
                cond_k = jax.lax.slice(cond_all, (lo,), (hi,))
                return quantize_candidate(y_c, m_c, cond_k)
            return fn

        @jax.jit
        def enc_finalize_single(cond_all, packed_idx, *y_qs):
            """Encoder-only (single-pass): one globally-compacted combined
            buffer in step order — one encode_y <-> one decode_y."""
            yq = jnp.concatenate([q.astype(jnp.int16).reshape(-1)
                                  for q in y_qs])
            packed_q = compact_vals(yq, cond_all)
            return (packed_q << 8) | (packed_idx.astype(jnp.int16) & 0xFF)

        def _enc_quant_ladder(step):
            """Encoder-only (ladder): quantize + per-step combined buffer."""
            @jax.jit
            def fn(y, q_enc, means, cond, packed_idx):
                y_c = phase_split(y * q_enc.astype(jnp.float32),
                                  terms[step])
                m_c = phase_split(means, terms[step]).astype(jnp.float32)
                y_q = quantize_candidate(y_c, m_c, cond)
                packed_q = compact_vals(
                    y_q.astype(jnp.int16).reshape(-1), cond)
                combined = (packed_q << 8) | (packed_idx.astype(jnp.int16)
                                              & 0xFF)
                return combined, y_q
            return fn

        def _cand_shape():
            if steps == 4:
                return (1, h2e, w2e, ch_y)
            return (1, h2e, w2e, 2 * ch_y)

        def _step_single(step):
            """SHARED enc+dec (means-only): merge + next means."""
            last = step == steps - 1

            @jax.jit
            def fn(y_q_int8, means, y_hat_so_far, spctx):
                m_c = phase_split(means, terms[step]).astype(jnp.float32)
                contrib = y_q_int8.astype(jnp.float32) + m_c
                y_hat_so_far = y_hat_so_far + phase_merge(
                    contrib, terms[step], ch_y, yh, yw)
                if last:
                    return y_hat_so_far
                means_next = _step_prior_means(step, spctx, y_hat_so_far)
                return y_hat_so_far, means_next
            return fn

        def _step_ladder(step):
            """SHARED enc+dec (scales+means): merge + next prior + next
            compacted indexes."""
            last = step == steps - 1

            @jax.jit
            def fn(y_q_int8, means, y_hat_so_far, spctx):
                m_c = phase_split(means, terms[step]).astype(jnp.float32)
                contrib = y_q_int8.astype(jnp.float32) + m_c
                y_hat_so_far = y_hat_so_far + phase_merge(
                    contrib, terms[step], ch_y, yh, yw)
                if last:
                    return y_hat_so_far
                scales, means_next = _prior_step(spctx, y_hat_so_far,
                                                 step + 1)
                idx, cond_next = _build_idx(scales, step + 1)
                packed_idx, packed_pos, count = compact_idx(idx, cond_next)
                return (y_hat_so_far, means_next, packed_idx, packed_pos,
                        count, cond_next)
            return fn

        @jax.jit
        def expand_all(decoded_padded, packed_pos):
            """Decoder-only (single-pass): sort ALL steps' symbols back."""
            dense = expand_from_pos(packed_pos, decoded_padded,
                                    steps * n_cand)
            return tuple(q.reshape(_cand_shape())
                         for q in jnp.split(dense, steps))

        @jax.jit
        def expand(decoded_padded, packed_pos):
            """Decoder-only (ladder): sort one step's symbols back."""
            dense = expand_from_pos(packed_pos, decoded_padded, n_cand)
            return dense.reshape(_cand_shape())

        def _final(reset):
            """SHARED enc+dec: q_dec scale + decoder trunk -> feature +
            DPB update.  The recon heads are NOT here: the reference
            encode also keeps a feature-domain DPB and never reconstructs
            frames (video_model_ht.py:436-441)."""
            @jax.jit
            def fn(y_hat_so_far, q_dec, ctx, qp):
                y_hat = y_hat_so_far * q_dec.astype(jnp.float32)
                feature = _apply(type(model).synthesis_feature, y_hat, ctx,
                                 qp)
                return feature, _state_update(feature, reset)
            return fn

        @jax.jit
        def recon(feature, qp):
            """Decode-only (or encoder-on-request): recon heads ->
            output frames."""
            return _apply(type(model).recon_frames, feature, qp, h, w)

        # Frame-sliced recon (chunk models): the 8-frame recon head splits
        # into pair slices so the PREVIOUS chunk's reconstruction can be
        # dispatched piecewise into each of this chunk's blocking
        # host-entropy waits — the decode-side graph/entropy interleave of
        # the reference (dmc_htl_proxy.cpp:606-690), generalized across
        # chunks.  ALL x_hat paths go through the same slice executables
        # so serial/pipelined decode and encoder-side recon stay
        # bit-identical.
        # single-pass variants have ONE host wait: the whole-recon
        # program fills it with better MXU batching than 4 slices would
        if (self.frame_delay == 8 and hasattr(cfg, "is_hts")
                and not self.single_pass):
            def _recon_slice(lo, hi):
                @jax.jit
                def fn(feature, qp):
                    return _apply(type(model).recon_frames, feature, qp,
                                  h, w, (lo, hi))
                return fn
            recon_slices = [_recon_slice(2 * s, 2 * s + 2) for s in range(4)]
            recon_cat = jax.jit(lambda *xs: jnp.concatenate(xs, 0))
        else:
            recon_slices, recon_cat = [recon], None

        @functools.lru_cache(maxsize=64)
        def slice_prog(bucket):
            return jax.jit(lambda b: jax.lax.slice(b, (0,), (bucket,)))

        step_fn = _step_single if single_pass else _step_ladder
        progs = {
            "seed_ref": seed_ref,
            "adaptor": {m: _adaptor_prog(m) for m in (False, True)},
            "enc_analysis": enc_analysis,
            "prior": prior,
            "step": [step_fn(k) for k in range(steps)],
            "final": {r: _final(r) for r in (False, True)},
            "recon": recon,
            "recon_slices": recon_slices,
            "recon_cat": recon_cat,
            "slice": slice_prog,
            "dims": (ph, pw, yh, yw, zh, zw, n_cand),
        }
        if single_pass:
            progs["enc_quant"] = [_enc_quant_single(k) for k in range(steps)]
            progs["enc_finalize"] = enc_finalize_single
            progs["expand_all"] = expand_all
        else:
            progs["enc_quant"] = [_enc_quant_ladder(k) for k in range(steps)]
            progs["expand"] = expand
        self._programs[key] = progs
        return progs

    def _get_dec_programs(self, h, w, n_lanes, lane_len):
        """Device-entropy-decode programs, keyed by geometry + lane
        layout (lane_len is bucket-rounded so streams of similar size
        share one executable)."""
        key = (h, w, n_lanes, lane_len)
        if key in self._dec_programs:
            return self._dec_programs[key]
        from ..rans.device_decode import init_state, make_decode_fn_auto

        p = self._get_programs(h, w)
        _, _, _, _, zh, zw, n_cand = p["dims"]
        ch_z = self.cfg.ch_z
        n_z = zh * zw * ch_z
        z_cdf, z_len = self._z_bank
        y_cdf, y_len = self._y_bank
        dec_z_core = make_decode_fn_auto(z_cdf, z_len, n_lanes, n_z)
        cap_y = (self.steps * n_cand) if self.single_pass else n_cand
        dec_y_core = make_decode_fn_auto(y_cdf, y_len, n_lanes, cap_y)
        zidx = jnp.asarray(np.arange(n_z, dtype=np.int32) % ch_z)

        @jax.jit
        def dec_z(lanes, qp):
            """Seed lane states from the stream bytes + decode z (CDF
            row (i % ch_z) + qp*ch_z, matching rans.cc decode_z)."""
            state = init_state(lanes)
            state, out = dec_z_core(state, zidx + qp * ch_z, n_z)
            return state, out.reshape(1, zh, zw, ch_z)

        progs = {"z": dec_z, "y": jax.jit(dec_y_core)}
        self._dec_programs[key] = progs
        return progs

    # ------------------------------------------------------------ encode

    def compress(self, x, qp, reset_feature_memory=False, h=None, w=None,
                 recon=False):
        """x: (1, H, W, 3*frame_delay) f32 in [-0.5, 0.5].

        Returns dict(bit_stream, ec_parallel) — like the reference
        compress (video_model_ht.py:436-441), the encoder keeps only the
        feature-domain DPB and does not reconstruct frames.  Pass
        recon=True to additionally get x_hat (runs the decode-side recon
        program on the encoder's feature; bit-identical to the
        decoder's)."""
        return self.compress_finish(self.compress_async(
            x, qp, reset_feature_memory, h, w, recon))

    def compress_sequence(self, chunks, qps, resets=None, h=None, w=None,
                          depth=2):
        """Pipelined encode of a chunk sequence (the cross-chunk analog
        of the reference's encode-side CPU/GPU overlap,
        dmc_hts_proxy.cpp:764-830).

        The encoder's device chain never consumes host data, so chunk
        k+1's network dispatches immediately while chunk k's symbol
        fetches + host rANS trail behind (`depth` chunks of lag).  On a
        high-latency link (the dev tunnel pays ~30 ms per blocking
        sync), throughput becomes device-bound instead of latency-bound.

        Returns a list of per-chunk compress() result dicts."""
        resets = resets or [False] * len(chunks)
        pending, results = [], []
        for x, qp, rs in zip(chunks, qps, resets):
            pending.append(self.compress_async(x, qp, rs, h, w))
            if len(pending) > depth:
                results.append(self.compress_finish(pending.pop(0)))
        while pending:
            results.append(self.compress_finish(pending.pop(0)))
        return results

    def compress_async(self, x, qp, reset_feature_memory=False, h=None,
                       w=None, recon=False):
        """Dispatch all device work + start async fetches; no host sync.
        Returns a state dict for compress_finish."""
        assert 0 <= int(qp) < self.qp_bank, f"qp {qp} out of range"
        assert self.ref_feature is not None, "DPB empty: add a ref frame first"
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        _, _, yh, yw, _, _, n_cand = p["dims"]
        reset = bool(reset_feature_memory)
        qp_arr = jnp.int32(qp)

        has_memory = self.memory is not None
        memory_arg = self.memory if has_memory else self.ref_feature  # dummy
        mem, ctx = p["adaptor"][has_memory](memory_arg, self.ref_feature)
        y, z_int8 = p["enc_analysis"](x, ctx, qp_arr)
        y_hat = jnp.zeros((1, yh, yw, self.cfg.ch_y), jnp.float32)

        start_copies(z_int8)
        if self.single_pass:
            (q_enc, q_dec, means, spctx, packed_idx, packed_pos, count,
             cond_all) = p["prior"](z_int8, mem, qp_arr)
            start_copies(count)
            y_qs = []
            for k in range(self.steps):
                y_q = p["enc_quant"][k](y, q_enc, means, cond_all)
                y_qs.append(y_q)
                out = p["step"][k](y_q, means, y_hat, spctx)
                if k < self.steps - 1:
                    y_hat, means = out
                else:
                    y_hat = out
            sym = p["enc_finalize"](cond_all, packed_idx, *y_qs)
            handles = [self._fetcher.start(p["slice"], sym, ("enc", h, w))]
            counts = [count]
        else:
            (q_enc, q_dec, means, spctx, packed_idx, packed_pos, count,
             cond) = p["prior"](z_int8, mem, qp_arr)
            sym, counts, handles = [], [], []
            for k in range(self.steps):
                combined, y_q = p["enc_quant"][k](y, q_enc, means, cond,
                                                  packed_idx)
                sym.append(combined)
                counts.append(count)
                start_copies(count)
                handles.append(self._fetcher.start(p["slice"], combined,
                                                   ("enc", h, w, k)))
                out = p["step"][k](y_q, means, y_hat, spctx)
                if k < self.steps - 1:
                    (y_hat, means, packed_idx, packed_pos, count,
                     cond) = out
                else:
                    y_hat = out
        feature, new_ref = p["final"][reset](y_hat, q_dec, ctx, qp_arr)
        self.ref_feature = new_ref
        self.memory = None if reset else mem
        x_hat = (self._recon_job(p, feature, qp_arr)[1]()
                 if recon else None)

        return {"handles": handles, "counts": counts, "z_int8": z_int8,
                "qp": int(qp), "x_hat": x_hat, "p": p}

    def compress_finish(self, st):
        """Host half of compress: wait for fetches, run rANS, emit the
        bitstream."""
        p = st["p"]
        counts_np = [int(c) for c in st["counts"]]
        total = sum(counts_np)
        ec_parallel = self.force_ec or min(rans.compute_ec_parallel(total),
                                           self.max_ec)
        self.encoder.reset()
        self.encoder.set_parallel(ec_parallel)
        if self.single_pass:
            coded = self._fetcher.finish(p["slice"], st["handles"][0], total)
            self.encoder.encode_y(coded)
        else:
            for k in range(self.steps - 1, -1, -1):
                coded = self._fetcher.finish(p["slice"], st["handles"][k],
                                             counts_np[k])
                self.encoder.encode_y(coded)
        z_np = np.asarray(st["z_int8"])
        ch_z = self.cfg.ch_z
        self.encoder.encode_z(z_np.reshape(-1), st["qp"] * ch_z, ch_z)
        self.encoder.flush()

        return {
            "bit_stream": self.encoder.get_encoded_stream(),
            "x_hat": st["x_hat"],
            "ec_parallel": ec_parallel,
        }

    # ------------------------------------------------------------ decode

    def _recon_job(self, p, feature, qp_arr):
        """Incrementally-dispatchable reconstruction of one chunk.

        Returns (step, finish): step(n) dispatches up to n more frame
        slices (cheap, non-blocking); finish() dispatches the rest and
        returns the full x_hat.  Every caller goes through the same
        slice executables, keeping all x_hat paths bit-identical."""
        progs = p["recon_slices"]
        parts = []

        def step(n=1):
            for _ in range(n):
                if len(parts) < len(progs):
                    parts.append(progs[len(parts)](feature, qp_arr))

        def finish():
            step(len(progs) - len(parts))
            if len(progs) == 1:
                return parts[0]
            return p["recon_cat"](*parts)
        return step, finish

    def decompress(self, bit_stream, qp, h, w, ec_part,
                   reset_feature_memory=False):
        feature, p, qp_arr = self._decompress_core(
            bit_stream, qp, h, w, ec_part, reset_feature_memory)
        _, finish = self._recon_job(p, feature, qp_arr)
        return {"x_hat": finish()}

    def decompress_sequence(self, streams, qps, h, w, ec_parts,
                            resets=None):
        """Pipelined decode of a chunk sequence.

        The decode chain is inherently serial per chunk (the host rANS
        feeds the device ladder), but the frame RECONSTRUCTION of chunk
        k-1 is independent of chunk k's entropy decode — so its frame
        SLICES are dispatched into each of chunk k's blocking
        host-entropy waits, filling the device during every rung of the
        ladder (the decode analog of the reference's entropy/graph
        overlap, dmc_hts_proxy.cpp:587-709; dmc_htl_proxy.cpp:606-690).

        Returns a list of x_hat device arrays (one per chunk)."""
        resets = resets or [False] * len(streams)
        outs = []
        prev_step, prev_finish = None, None

        for bs, qp, ec, rs in zip(streams, qps, ec_parts, resets):
            def fill(n, _s=prev_step):
                if _s is not None:
                    _s(n)
            feature, p, qp_arr = self._decompress_core(
                bs, qp, h, w, ec, rs, pre_wait=fill)
            if prev_finish is not None:
                outs.append(prev_finish())
            prev_step, prev_finish = self._recon_job(p, feature, qp_arr)
        outs.append(prev_finish())
        return outs

    def _decompress_core(self, bit_stream, qp, h, w, ec_part,
                         reset_feature_memory=False, pre_wait=None):
        """Entropy decode + device ladder up to the decoder feature/DPB
        update.  `pre_wait` is called right before the blocking
        CDF-index fetch (a slot for pipelined device work)."""
        assert 0 <= int(qp) < self.qp_bank, f"qp {qp} out of range"
        assert self.ref_feature is not None, "DPB empty: add a ref frame first"
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw, n_cand = p["dims"]
        ch_z, ch_y = self.cfg.ch_z, self.cfg.ch_y
        qp_arr = jnp.int32(qp)
        reset = bool(reset_feature_memory)

        if self.device_ec:
            return self._decompress_core_device(
                bit_stream, qp_arr, h, w, ec_part, reset, p)

        self.decoder.set_parallel(ec_part)
        self.decoder.set_stream(bit_stream)
        z_num = zh * zw * ch_z
        self.decoder.decode_z(z_num, int(qp) * ch_z, ch_z)
        z_int8 = jnp.asarray(self.decoder.get_decoded().reshape(1, zh, zw, ch_z))

        has_memory = self.memory is not None
        memory_arg = self.memory if has_memory else self.ref_feature  # dummy
        mem, ctx = p["adaptor"][has_memory](memory_arg, self.ref_feature)
        y_hat = jnp.zeros((1, yh, yw, ch_y), jnp.float32)

        n_slices = len(p["recon_slices"])
        if self.single_pass:
            (q_enc, q_dec, means, spctx, packed_idx, packed_pos, count,
             cond_all) = p["prior"](z_int8, mem, qp_arr)
            start_copies(count)
            handle = self._fetcher.start(p["slice"], packed_idx,
                                         ("dec", h, w))
            if pre_wait is not None:
                pre_wait(n_slices)   # single wait: fill with everything
            c = int(count)
            idx_np = self._fetcher.finish(p["slice"], handle, c, np.uint8)
            if c > 0:
                self.decoder.decode_y(idx_np)
                decoded = self.decoder.get_decoded()
                pad = np.zeros(_round_bucket(c, self.steps * n_cand),
                               np.int8)
                pad[:c] = decoded
            else:
                pad = np.zeros(min(BUCKET, self.steps * n_cand), np.int8)
            y_qs = p["expand_all"](jnp.asarray(pad), packed_pos)
            for k in range(self.steps):
                out = p["step"][k](y_qs[k], means, y_hat, spctx)
                if k < self.steps - 1:
                    y_hat, means = out
                else:
                    y_hat = out
        else:
            (q_enc, q_dec, means, spctx, packed_idx, packed_pos, count,
             cond) = p["prior"](z_int8, mem, qp_arr)
            start_copies(count)
            handle = self._fetcher.start(p["slice"], packed_idx,
                                         ("dec", h, w, 0))
            # spread the previous chunk's recon slices across the
            # ladder's host waits (one slice per rung)
            per_wait = max(1, -(-n_slices // self.steps))
            for k in range(self.steps):
                if pre_wait is not None:
                    pre_wait(per_wait)
                c = int(count)
                idx_np = self._fetcher.finish(p["slice"], handle, c,
                                              np.uint8)
                if c > 0:
                    self.decoder.decode_y(idx_np)
                    decoded = self.decoder.get_decoded()
                    pad = np.zeros(_round_bucket(c, n_cand), np.int8)
                    pad[:c] = decoded
                else:
                    pad = np.zeros(min(BUCKET, n_cand), np.int8)
                y_q = p["expand"](jnp.asarray(pad), packed_pos)
                out = p["step"][k](y_q, means, y_hat, spctx)
                if k < self.steps - 1:
                    (y_hat, means, packed_idx, packed_pos, count,
                     cond) = out
                    start_copies(count)
                    handle = self._fetcher.start(p["slice"], packed_idx,
                                                 ("dec", h, w, k + 1))
                else:
                    y_hat = out

        feature, new_ref = p["final"][reset](y_hat, q_dec, ctx, qp_arr)
        self.ref_feature = new_ref
        self.memory = None if reset else mem
        return feature, p, qp_arr

    def _decompress_core_device(self, bit_stream, qp_arr, h, w, ec_part,
                                reset, p):
        """Device-entropy decode: the whole ladder (z decode, prior,
        per-rung rANS + merge, final) is one async dispatch chain with
        ZERO blocking host round-trips — the TPU-native replacement for
        the reference's decode-side entropy/graph overlap
        (dmci_proxy.cpp:423-602, dmc_htl_proxy.cpp:606-690), which only
        needs to hide microsecond host hops.  Symbols are bit-identical
        to the host coder (tests/test_device_decode.py), so every
        downstream executable and x_hat match the host path exactly."""
        from ..rans.device_decode import bucketed_lanes
        _, _, yh, yw, zh, zw, n_cand = p["dims"]
        ch_y = self.cfg.ch_y
        lanes = bucketed_lanes(bit_stream, ec_part)
        dp = self._get_dec_programs(h, w, ec_part, lanes.shape[1])

        state, z_int8 = dp["z"](jnp.asarray(lanes), qp_arr)

        has_memory = self.memory is not None
        memory_arg = self.memory if has_memory else self.ref_feature
        mem, ctx = p["adaptor"][has_memory](memory_arg, self.ref_feature)
        y_hat = jnp.zeros((1, yh, yw, ch_y), jnp.float32)

        if self.single_pass:
            (q_enc, q_dec, means, spctx, packed_idx, packed_pos, count,
             cond_all) = p["prior"](z_int8, mem, qp_arr)
            state, decoded = dp["y"](state, packed_idx, count)
            y_qs = p["expand_all"](decoded, packed_pos)
            for k in range(self.steps):
                out = p["step"][k](y_qs[k], means, y_hat, spctx)
                if k < self.steps - 1:
                    y_hat, means = out
                else:
                    y_hat = out
        else:
            (q_enc, q_dec, means, spctx, packed_idx, packed_pos, count,
             cond) = p["prior"](z_int8, mem, qp_arr)
            for k in range(self.steps):
                state, decoded = dp["y"](state, packed_idx, count)
                y_q = p["expand"](decoded, packed_pos)
                out = p["step"][k](y_q, means, y_hat, spctx)
                if k < self.steps - 1:
                    (y_hat, means, packed_idx, packed_pos, count,
                     cond) = out
                else:
                    y_hat = out

        feature, new_ref = p["final"][reset](y_hat, q_dec, ctx, qp_arr)
        self.ref_feature = new_ref
        self.memory = None if reset else mem
        return feature, p, qp_arr


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
