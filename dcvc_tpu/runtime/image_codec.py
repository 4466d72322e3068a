"""DMCI inference runtime: the TPU-native counterpart of the reference
DMCIProxy (src/layers/extensions/inference/dmci_proxy.cpp).

Bit-exactness architecture (the enc/dec contract):
  Encoder and decoder MUST produce bit-identical priors/means/recon or
  streams fail to decode.  XLA does not guarantee that the same math in
  *different* programs (different fusion contexts) is bit-identical —
  producer-consumer fusion (e.g. analysis feeding the prior inside one
  fused encode program) was observed to perturb conv results in bf16.
  The runtime therefore shares the jitted sub-programs: every tensor
  that influences symbol decisions or reconstruction (priors, means
  accumulation, synthesis) is computed by the LITERALLY SAME compiled
  executable on both sides, and only exact integer tensors (z int8,
  y_q int8, symbol indexes) cross program boundaries.

Symbol-path architecture: all quantization/entropy bookkeeping runs in
the quarter-size "candidate domain" (phase-split subgrids of each
quadtree mask, core/masks.py) and symbol compaction/expansion is
sort-based (runtime/symbols.py) — replacing the reference's scatter
kernels, which are slow on TPU.

Program graph (4-step quadtree ladder, dmci_proxy.cpp:296-601):
  enc:  analysis -> [shared prior0] -> { enc_quant_k -> [shared step_k] }*4
        -> [shared synthesis]
  dec:  host z rANS -> [shared prior0] -> { host y rANS -> expand_k ->
        [shared step_k] }*4 -> [shared synthesis]
One executable serves all 64 QPs (QP is a traced bank index).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import (phase_terms_4x, phase_split, phase_merge,
                          phase_valid, terms_key)
from ..core.padding import get_padding_size
from ..entropy.bit_estimator import BitEstimator
from ..entropy.gaussian import GaussianConditional, scale_to_index
from ..models.dmci import DMCI, DMCIConfig
from .. import rans
from .fetch import BUCKET, CodedFetcher, round_bucket as _round_bucket, \
    start_copies
from .symbols import (compact_idx, compact_vals, expand_from_pos,
                      quantize_candidate)


def compact_device(values, cond):
    """Stable stream compaction (sort-based): coded values move to the
    front, count returned.  values, cond: flat (N,)."""
    packed = compact_vals(values, cond)
    return packed, jnp.sum(cond, dtype=jnp.int32)


def expand_device(decoded_padded, cond):
    """Inverse of compact_device: place decoded[pos] at coded positions,
    zero elsewhere.  decoded_padded: (C,) with C >= count."""
    pos = jnp.cumsum(cond.astype(jnp.int32)) - 1
    cap = decoded_padded.shape[0]
    gathered = jnp.take(decoded_padded, jnp.clip(pos, 0, cap - 1),
                        mode="clip")
    return jnp.where(cond, gathered, 0)


class DMCICodec:
    """Holds model params + CDF banks + compiled-program cache and
    implements compress/decompress against the NAL bitstream payload."""

    MODEL_CLS = DMCI
    CONFIG_CLS = DMCIConfig
    MAX_EC = 8          # DCVC-RT's container caps this at 2 (1-bit SPS flag)

    def __init__(self, params, cfg=None, skip_thres=0.0, dtype=jnp.bfloat16,
                 spatial_mesh=None, device_ec=None):
        self.cfg = cfg or self.CONFIG_CLS()
        self.model = self.MODEL_CLS(cfg=self.cfg, dtype=dtype)
        self.params = params
        self.dtype = dtype
        self.skip_thres = float(skip_thres)
        # container formats with a sequence-level lane flag (DCVC-RT SPS
        # ec_part) pin the lane count instead of sizing it per frame
        self.force_ec = None
        # 4K-latency scaling: H-shard the heavy conv transforms
        # (analysis/synthesis) over this mesh; GSPMD inserts the 3x3-conv
        # halo exchanges (parallel/spatial.py).  Symbol bookkeeping stays
        # replicated, so streams are REQUIRED to be identical to the
        # unsharded codec (tests/test_spatial_stream.py enforces it).
        self.spatial_mesh = spatial_mesh

        # CDF banks (reference CompressionModel.update + add_cdf_to_state_dict)
        be = BitEstimator(self.cfg.qp_num, self.cfg.ch_z)
        z_cdf, z_len = be.compute_cdf_bank(params["bit_estimator_z"], 8)
        g = GaussianConditional(skip_thres)
        y_cdf, y_len = g.compute_cdf_bank()

        self._cdf_banks = ((z_cdf, z_len), (y_cdf, y_len))
        self.encoder = rans.RansEncoder()
        self.decoder = rans.RansDecoder()
        for coder in (self.encoder, self.decoder):
            coder.set_cdf(z_cdf, z_len, 0)
            coder.set_cdf(y_cdf, y_len, 1)

        # device entropy decode (rans/device_decode.py): the 4-rung
        # ladder's rANS runs INSIDE jit, making decode a pure async
        # dispatch chain (no blocking host round-trips); symbols are
        # bit-identical to the host coder so x_hat is unchanged
        # (tests/test_device_ec_codec.py).  OFF by default until the
        # Pallas kernel lands — see video_codec.py for the measured
        # XLA-loop cost.
        self.device_ec = bool(device_ec) if device_ec is not None else False

        # diagnostic symbol capture (cross-platform conformance,
        # scripts/cross_platform_conformance.py): when set, compress and
        # decompress append their exact coded symbol arrays here
        self.collect_symbols = None

        self._programs = {}
        self._dec_programs = {}
        self._fetcher = CodedFetcher()
        self._decoder_pool = [self.decoder]

    def _get_decoder(self, slot):
        """Per-in-flight-frame rANS decoders: each holds its own stream
        state so frame decodes can interleave (decompress_many)."""
        while slot >= len(self._decoder_pool):
            d = rans.RansDecoder()
            (z_cdf, z_len), (y_cdf, y_len) = self._cdf_banks
            d.set_cdf(z_cdf, z_len, 0)
            d.set_cdf(y_cdf, y_len, 1)
            self._decoder_pool.append(d)
        return self._decoder_pool[slot]

    @classmethod
    def init_random(cls, rng=None, cfg=None, dtype=jnp.bfloat16, **kwargs):
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or cls.CONFIG_CLS()
        model = cls.MODEL_CLS(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        # jit the init: one compile instead of hundreds of eager per-op
        # dispatches (which crawl on high-latency dispatch paths)
        init_fn = jax.jit(lambda r1, r2: model.init({"params": r1}, x, 0, r2))
        variables = init_fn(rng, jax.random.PRNGKey(1))
        return cls(jax.tree.map(np.asarray, variables["params"]),
                   cfg=cfg, dtype=dtype, **kwargs)

    # ------------------------------------------------------------ programs

    def _get_programs(self, h, w):
        """Compile (or fetch) the stage programs for original size (h, w)."""
        key = (h, w)
        if key in self._programs:
            return self._programs[key]

        # frames pad to 16 (reference test_video.py:187), so the latent
        # grid may be ODD (720p -> 45, 2160p -> 135); the hyper path pads
        # y to 4-alignment internally (models pad_for_y) and the
        # candidate domain excludes the even-ing lanes via phase_valid
        pad_r, pad_b = get_padding_size(h, w, 16)
        ph, pw = h + pad_b, w + pad_r
        yh, yw = ph // 16, pw // 16
        zh, zw = (yh + 3) // 4, (yw + 3) // 4
        h2e, w2e = (yh + 1) // 2, (yw + 1) // 2
        ch_y = self.cfg.ch_y
        terms = phase_terms_4x(ch_y)
        valid = [phase_valid(yh, yw, terms_key(terms[k])) for k in range(4)]
        n_cand = h2e * w2e * ch_y  # per-step candidate count
        variables = {"params": self.params}
        model = self.model
        skip = self.skip_thres

        def _prior_step(ctx, y_hat_so_far, step):
            return model.apply(variables, ctx, y_hat_so_far, step,
                               method=DMCI.prior_step)

        def _build_idx(scales, step):
            """Candidate-domain scale indexes + skip conditions + their
            stable compaction, for mask step `step`."""
            sc = phase_split(scales, terms[step]).astype(jnp.float32)
            flat = sc.reshape(-1)
            idx = scale_to_index(flat).astype(jnp.uint8)
            cond = flat > skip
            if not valid[step].all():
                cond = cond & jnp.asarray(valid[step])
            packed_idx, packed_pos, count = compact_idx(idx, cond)
            return packed_idx, packed_pos, count, cond

        if self.spatial_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            _sp = NamedSharding(self.spatial_mesh,
                                PartitionSpec(None, "data", None, None))
            _rp = NamedSharding(self.spatial_mesh, PartitionSpec())

            def _jit_sharded(fn, in_sh, out_sh):
                return jax.jit(fn, in_shardings=in_sh, out_shardings=out_sh)
        else:
            _sp = _rp = None

        def _analysis(x, qp):
            """Encoder-only: pad + analysis transform.  z is materialized
            as int8 (exact) before any shared consumer sees it."""
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                        mode="edge")
            y_scaled, z_int8 = model.apply(variables, x.astype(model.dtype),
                                           qp, method=DMCI.analysis)
            return y_scaled.astype(jnp.float32), z_int8

        if self.spatial_mesh is not None:
            # H-sharded conv stack; replicated outputs keep every symbol
            # tensor bit-identical to the unsharded program chain
            analysis = _jit_sharded(
                lambda x, qp: _analysis(jax.lax.with_sharding_constraint(
                    x, _sp), qp), (_sp, _rp), (_rp, _rp))
        else:
            analysis = jax.jit(_analysis)

        @jax.jit
        def prior0(z_int8):
            """SHARED enc+dec: hyper prior + step-0 compacted indexes."""
            scales, means, ctx = model.apply(variables, z_int8, yh, yw,
                                             method=DMCI.prior0)
            packed_idx, packed_pos, count, cond = _build_idx(scales, 0)
            return means, ctx, packed_idx, packed_pos, count, cond

        def _enc_quant(step):
            """Encoder-only per-step quantization in the candidate
            domain.  cond/packed_idx come from the shared prior program;
            outputs are integers."""
            @jax.jit
            def fn(y_scaled, means, cond, packed_idx):
                y_c = phase_split(y_scaled, terms[step])
                m_c = phase_split(means, terms[step]).astype(jnp.float32)
                y_q = quantize_candidate(y_c, m_c, cond)
                packed_q = compact_vals(
                    y_q.astype(jnp.int16).reshape(-1), cond)
                combined = (packed_q << 8) | (packed_idx.astype(jnp.int16)
                                              & 0xFF)
                return combined, y_q
            return fn

        def _step(step):
            """SHARED enc+dec ladder rung: merge integer y_q + means into
            y_hat, then the next spatial prior + indexes."""
            last = step == 3

            @jax.jit
            def fn(y_q_int8, means, y_hat_so_far, ctx):
                m_c = phase_split(means, terms[step]).astype(jnp.float32)
                contrib = y_q_int8.astype(jnp.float32) + m_c
                y_hat_so_far = y_hat_so_far + phase_merge(
                    contrib, terms[step], ch_y, yh, yw)
                if last:
                    return y_hat_so_far
                scales, means_next = _prior_step(ctx, y_hat_so_far, step + 1)
                packed_idx, packed_pos, count, cond = _build_idx(
                    scales, step + 1)
                return (y_hat_so_far, means_next, packed_idx, packed_pos,
                        count, cond)
            return fn

        @jax.jit
        def expand(decoded_padded, packed_pos):
            """Decoder-only: sort decoded symbols back to the candidate
            grid (runtime/symbols.py)."""
            dense = expand_from_pos(packed_pos, decoded_padded, n_cand)
            return dense.reshape(1, h2e, w2e, ch_y)

        def _synthesis(y_hat_so_far, qp):
            """SHARED enc+dec reconstruction."""
            return model.apply(variables, y_hat_so_far, qp, h, w,
                               method=DMCI.synthesis)

        if self.spatial_mesh is not None:
            # latent rows sharded through the synthesis conv stack
            synthesis = _jit_sharded(
                lambda yy, qp: _synthesis(jax.lax.with_sharding_constraint(
                    yy, _sp), qp), (_rp, _rp), _rp)
        else:
            synthesis = jax.jit(_synthesis)

        @functools.lru_cache(maxsize=64)
        def slice_prog(bucket):
            return jax.jit(lambda b: jax.lax.slice(b, (0,), (bucket,)))

        progs = {
            "analysis": analysis,
            "prior0": prior0,
            "enc_quant": [_enc_quant(k) for k in range(4)],
            "step": [_step(k) for k in range(4)],
            "expand": expand,
            "synthesis": synthesis,
            "slice": slice_prog,
            "dims": (ph, pw, yh, yw, zh, zw, n_cand),
        }
        self._programs[key] = progs
        return progs

    # ------------------------------------------------------------- encode

    def compress(self, x, qp, h=None, w=None):
        """x: (1, H, W, 3) float32 NHWC in [-0.5, 0.5] (unpadded).

        Returns dict(bit_stream, x_hat, ec_parallel) like the reference
        DMCI.compress (image_model.py:194-212).
        """
        return self.compress_finish(self.compress_async(x, qp, h, w))

    def compress_many(self, images, qps, depth=4):
        """Pipelined encode of independent images: image k+1's device
        chain dispatches while image k's symbol fetches + host rANS
        trail behind (the cross-frame analog of the reference's
        enc_1/entropy overlap, dmci_proxy.cpp:296-421)."""
        pending, results = [], []
        for x, qp in zip(images, qps):
            pending.append(self.compress_async(x, qp))
            if len(pending) > depth:
                results.append(self.compress_finish(pending.pop(0)))
        while pending:
            results.append(self.compress_finish(pending.pop(0)))
        return results

    def compress_async(self, x, qp, h=None, w=None):
        """Device half of compress: dispatch the full encode chain and
        start all symbol fetches; no host sync."""
        assert 0 <= int(qp) < self.cfg.qp_num, f"qp {qp} out of range"
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        _, _, yh, yw, _, _, n_cand = p["dims"]
        qp_arr = jnp.int32(qp)

        y_scaled, z_int8 = p["analysis"](x, qp_arr)
        start_copies(z_int8)
        means, ctx, packed_idx, packed_pos, count, cond = p["prior0"](z_int8)
        y_hat = jnp.zeros((1, yh, yw, self.cfg.ch_y), jnp.float32)
        packed, counts, handles = [], [], []
        for k in range(4):
            combined, y_q = p["enc_quant"][k](y_scaled, means, cond,
                                              packed_idx)
            packed.append(combined)
            counts.append(count)
            # start D2H of this step's count + predicted-bucket payload
            # now, so transfers hide behind the remaining device ladder
            start_copies(count)
            handles.append(self._fetcher.start(p["slice"], combined,
                                               ("enc", h, w, k)))
            out = p["step"][k](y_q, means, y_hat, ctx)
            if k < 3:
                y_hat, means, packed_idx, packed_pos, count, cond = out
            else:
                y_hat = out
        x_hat = p["synthesis"](y_hat, qp_arr)

        return {"p": p, "handles": handles, "counts": counts,
                "z_int8": z_int8, "qp": int(qp), "x_hat": x_hat}

    def compress_finish(self, st):
        """Host half of compress: wait for fetches, run rANS, emit the
        bitstream."""
        p = st["p"]
        counts_np = [int(c) for c in st["counts"]]
        coded = [self._fetcher.finish(p["slice"], st["handles"][k],
                                      counts_np[k])
                 for k in range(4)]
        z_np = np.asarray(st["z_int8"])

        total = sum(counts_np)
        ec_parallel = self.force_ec or min(rans.compute_ec_parallel(total),
                                           self.MAX_EC)
        if self.collect_symbols is not None:
            self.collect_symbols.append(
                {"z": z_np.reshape(-1).copy(),
                 "y": [(np.asarray(c) >> 8).astype(np.int8) for c in coded],
                 "idx": [(np.asarray(c) & 0xFF).astype(np.uint8)
                         for c in coded]})
        self.encoder.reset()
        self.encoder.set_parallel(ec_parallel)
        for k in range(3, -1, -1):  # reverse step order (dmci_proxy.cpp:838)
            self.encoder.encode_y(coded[k])
        ch_z = self.cfg.ch_z
        self.encoder.encode_z(z_np.reshape(-1), st["qp"] * ch_z, ch_z)
        self.encoder.flush()

        return {
            "bit_stream": self.encoder.get_encoded_stream(),
            "x_hat": st["x_hat"],
            "ec_parallel": ec_parallel,
        }

    # ------------------------------------------------------------- decode

    def decompress(self, bit_stream, qp, h, w, ec_part):
        """Returns dict(x_hat) with x_hat (1, h, w, 3) f32 in [-0.5, 0.5]."""
        out = {}
        for _ in self._decompress_gen(self.decoder, bit_stream, qp, h, w,
                                      ec_part, out):
            pass
        return out

    def decompress_many(self, streams, qps, h, w, ec_parts, depth=10):
        """Pipelined decode of independent images.

        Each image's 4-step ladder is serial (host rANS feeds the device
        steps), but with `depth` images in flight the blocking fetches of
        image i overlap the already-dispatched device steps of images
        i+1.. — a round-robin over per-image decode coroutines, each
        holding its own rANS decoder.  Cross-frame generalization of the
        reference's interleaved {CPU entropy <-> GPU graph} decode
        (dmci_proxy.cpp:423-602).

        Depth sizing: a frame's step-k fetch is issued one full
        scheduler round before its wait, so the link round-trip hides
        iff (depth-1) x per-turn-work >= link latency; ~10 covers a
        ~30 ms tunnel at ~4 ms turns (a directly-attached chip needs
        far less; extra depth only costs idle coroutines)."""
        jobs = list(zip(streams, qps, ec_parts))
        outs = [{} for _ in jobs]
        live, slots, next_i = [], list(range(depth)), 0
        while live or next_i < len(jobs):
            while slots and next_i < len(jobs):
                bs, qp, ec = jobs[next_i]
                slot = slots.pop(0)
                gen = self._decompress_gen(
                    self._get_decoder(slot), bs, qp, h, w, ec,
                    outs[next_i])
                live.append((gen, slot))
                next_i += 1
            for item in list(live):
                gen, slot = item
                try:
                    next(gen)
                except StopIteration:
                    live.remove(item)
                    slots.append(slot)
        return outs

    def _get_dec_programs(self, h, w, n_lanes, lane_len):
        """Device-entropy-decode programs (see video_codec.py)."""
        key = (h, w, n_lanes, lane_len)
        if key in self._dec_programs:
            return self._dec_programs[key]
        from ..rans.device_decode import init_state, make_decode_fn_auto

        p = self._get_programs(h, w)
        _, _, _, _, zh, zw, n_cand = p["dims"]
        ch_z = self.cfg.ch_z
        n_z = zh * zw * ch_z
        (z_cdf, z_len), (y_cdf, y_len) = self._cdf_banks
        dec_z_core = make_decode_fn_auto(z_cdf, z_len, n_lanes, n_z)
        dec_y_core = make_decode_fn_auto(y_cdf, y_len, n_lanes, n_cand)
        zidx = jnp.asarray(np.arange(n_z, dtype=np.int32) % ch_z)

        @jax.jit
        def dec_z(lanes, qp):
            state = init_state(lanes)
            state, out = dec_z_core(state, zidx + qp * ch_z, n_z)
            return state, out.reshape(1, zh, zw, ch_z)

        progs = {"z": dec_z, "y": jax.jit(dec_y_core)}
        self._dec_programs[key] = progs
        return progs

    def _decompress_gen_device(self, bit_stream, qp, h, w, ec_part, out):
        """Device-entropy decode: z decode, prior, 4 rungs of in-jit
        rANS + merge, synthesis — all dispatched asynchronously, no
        blocking host round-trips (the TPU-native replacement for the
        reference's entropy/graph overlap, dmci_proxy.cpp:423-602)."""
        from ..rans.device_decode import bucketed_lanes
        assert 0 <= int(qp) < self.cfg.qp_num, f"qp {qp} out of range"
        p = self._get_programs(h, w)
        _, _, yh, yw, _, _, n_cand = p["dims"]
        ch_y = self.cfg.ch_y
        qp_arr = jnp.int32(qp)
        lanes = bucketed_lanes(bit_stream, ec_part)
        dp = self._get_dec_programs(h, w, ec_part, lanes.shape[1])

        state, z_int8 = dp["z"](jnp.asarray(lanes), qp_arr)
        means, ctx, packed_idx, packed_pos, count, cond = p["prior0"](z_int8)
        y_hat = jnp.zeros((1, yh, yw, ch_y), jnp.float32)
        collect = ({"z": np.asarray(z_int8).reshape(-1), "y": [], "idx": []}
                   if self.collect_symbols is not None else None)
        for k in range(4):
            state, decoded = dp["y"](state, packed_idx, count)
            if collect is not None:
                c = int(count)
                collect["y"].append(np.asarray(decoded)[:c].copy())
                collect["idx"].append(np.asarray(packed_idx)[:c].copy())
            y_q = p["expand"](decoded, packed_pos)
            step_out = p["step"][k](y_q, means, y_hat, ctx)
            if k < 3:
                y_hat, means, packed_idx, packed_pos, count, cond = step_out
            else:
                y_hat = step_out
            yield  # everything above is async; let other frames dispatch

        if collect is not None:
            self.collect_symbols.append(collect)
        out["x_hat"] = p["synthesis"](y_hat, qp_arr)

    def _decompress_gen(self, decoder, bit_stream, qp, h, w, ec_part, out):
        """Decode coroutine: yields at the points where the next action
        would block on device->host data, so a scheduler can interleave
        other frames' device dispatches in the gaps."""
        if self.device_ec:
            yield from self._decompress_gen_device(bit_stream, qp, h, w,
                                                   ec_part, out)
            return
        assert 0 <= int(qp) < self.cfg.qp_num, f"qp {qp} out of range"
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw, n_cand = p["dims"]
        ch_z, ch_y = self.cfg.ch_z, self.cfg.ch_y
        qp_arr = jnp.int32(qp)

        decoder.set_parallel(ec_part)
        decoder.set_stream(bit_stream)
        z_num = zh * zw * ch_z
        decoder.decode_z(z_num, int(qp) * ch_z, ch_z)
        yield  # z entropy decode proceeds in the C++ lanes meanwhile
        z_int8 = jnp.asarray(decoder.get_decoded().reshape(1, zh, zw, ch_z))

        means, ctx, packed_idx, packed_pos, count, cond = p["prior0"](z_int8)
        y_hat = jnp.zeros((1, yh, yw, ch_y), jnp.float32)
        collect = ({"z": np.asarray(z_int8).reshape(-1), "y": [], "idx": []}
                   if self.collect_symbols is not None else None)

        start_copies(count)
        handle = self._fetcher.start(p["slice"], packed_idx,
                                     ("dec", h, w, 0))
        for k in range(4):
            yield  # count/index D2H in flight
            c = int(count)
            idx_np = self._fetcher.finish(p["slice"], handle, c, np.uint8)
            if c > 0:
                decoder.decode_y(idx_np)
                yield  # rANS lanes chew while other frames take turns
                decoded = decoder.get_decoded()
                pad = np.zeros(_round_bucket(c, n_cand), np.int8)
                pad[:c] = decoded
            else:
                decoded = np.zeros(0, np.int8)
                pad = np.zeros(min(BUCKET, n_cand), np.int8)
            if collect is not None:
                collect["y"].append(decoded[:c].copy())
                collect["idx"].append(idx_np[:c].copy())
            y_q = p["expand"](jnp.asarray(pad), packed_pos)
            step_out = p["step"][k](y_q, means, y_hat, ctx)
            if k < 3:
                y_hat, means, packed_idx, packed_pos, count, cond = step_out
                # next step's count/indexes start their D2H now, hiding
                # behind this step's host rANS + device accumulate
                start_copies(count)
                handle = self._fetcher.start(p["slice"], packed_idx,
                                             ("dec", h, w, k + 1))
            else:
                y_hat = step_out

        if collect is not None:
            self.collect_symbols.append(collect)
        out["x_hat"] = p["synthesis"](y_hat, qp_arr)
