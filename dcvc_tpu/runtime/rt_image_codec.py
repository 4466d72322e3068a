"""DCVC-RT intra inference runtime.

Same ladder architecture as the UF image runtime (runtime/image_codec.py
— shared enc/dec executables, candidate-domain symbols, sort-based
compaction), with the RT-specific quantization source: q_enc / q_dec are
HYPER-PREDICTED per-position maps emitted by the shared prior0 program
(DCVC-RT/src/models/common_model.py:63-73) instead of per-QP channel
vectors, so the encoder scales y by q_enc after prior0 and synthesis
consumes q_dec.  The RT container caps entropy-coder parallelism at 2
(1-bit ec_part in the SPS, DCVC-RT/src/utils/stream_helper.py:148-162).

Reference: DCVC-RT/src/models/image_model.py:116-209 compress/decompress.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import (phase_terms_4x, phase_split, phase_merge,
                          phase_valid, terms_key)
from ..core.padding import get_padding_size
from ..entropy.gaussian import scale_to_index
from ..legacy.rt_intra import DMCIRT, DMCIRTConfig
from .. import rans
from .fetch import BUCKET, round_bucket as _round_bucket, start_copies
from .image_codec import DMCICodec
from .symbols import compact_idx, compact_vals, expand_from_pos, \
    quantize_candidate


class RTIntraCodec(DMCICodec):
    MODEL_CLS = DMCIRT
    CONFIG_CLS = DMCIRTConfig
    MAX_EC = 2

    # ------------------------------------------------------------ programs

    def _get_programs(self, h, w):
        key = (h, w)
        if key in self._programs:
            return self._programs[key]

        # frames pad to 16 (RT reference test_video.py:150), so the
        # latent grid may be ODD; see image_codec._get_programs
        pad_r, pad_b = get_padding_size(h, w, 16)
        ph, pw = h + pad_b, w + pad_r
        yh, yw = ph // 16, pw // 16
        zh, zw = (yh + 3) // 4, (yw + 3) // 4
        h2e, w2e = (yh + 1) // 2, (yw + 1) // 2
        ch_y = self.cfg.ch_y
        terms = phase_terms_4x(ch_y)
        valid = [phase_valid(yh, yw, terms_key(terms[k])) for k in range(4)]
        n_cand = h2e * w2e * ch_y
        variables = {"params": self.params}
        model = self.model
        skip = self.skip_thres

        def _prior_step(ctx, y_hat_so_far, step):
            return model.apply(variables, ctx, y_hat_so_far, step,
                               method=DMCIRT.prior_step)

        def _build_idx(scales, step):
            sc = phase_split(scales, terms[step]).astype(jnp.float32)
            flat = sc.reshape(-1)
            idx = scale_to_index(flat).astype(jnp.uint8)
            cond = flat > skip
            if not valid[step].all():
                cond = cond & jnp.asarray(valid[step])
            packed_idx, packed_pos, count = compact_idx(idx, cond)
            return packed_idx, packed_pos, count, cond

        @jax.jit
        def analysis(x, qp):
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                        mode="edge")
            y, z_int8 = model.apply(variables, x.astype(model.dtype), qp,
                                    method=DMCIRT.analysis)
            return y, z_int8

        @jax.jit
        def prior0(z_int8):
            """SHARED enc+dec: also emits the hyper q maps."""
            scales, means, ctx, q_enc, q_dec = model.apply(
                variables, z_int8, yh, yw, method=DMCIRT.prior0)
            packed_idx, packed_pos, count, cond = _build_idx(scales, 0)
            return (means, ctx, q_enc, q_dec, packed_idx, packed_pos,
                    count, cond)

        def _enc_quant(step):
            """Encoder-only: y scaled by the hyper q_enc map, then the
            standard candidate-domain quantization."""
            @jax.jit
            def fn(y, q_enc, means, cond, packed_idx):
                y_scaled = (y * q_enc).astype(jnp.float32)
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
            dense = expand_from_pos(packed_pos, decoded_padded, n_cand)
            return dense.reshape(1, h2e, w2e, ch_y)

        @jax.jit
        def synthesis(y_hat_so_far, q_dec, qp):
            return model.apply(variables, y_hat_so_far, q_dec, qp, h, w,
                               method=DMCIRT.synthesis)

        import functools

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

    def compress_async(self, x, qp, h=None, w=None):
        assert 0 <= int(qp) < self.cfg.qp_num, f"qp {qp} out of range"
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        _, _, yh, yw, _, _, n_cand = p["dims"]
        qp_arr = jnp.int32(qp)

        y, z_int8 = p["analysis"](x, qp_arr)
        start_copies(z_int8)
        (means, ctx, q_enc, q_dec, packed_idx, packed_pos, count,
         cond) = p["prior0"](z_int8)
        y_hat = jnp.zeros((1, yh, yw, self.cfg.ch_y), jnp.float32)
        packed, counts, handles = [], [], []
        for k in range(4):
            combined, y_q = p["enc_quant"][k](y, q_enc, means, cond,
                                              packed_idx)
            packed.append(combined)
            counts.append(count)
            start_copies(count)
            handles.append(self._fetcher.start(p["slice"], combined,
                                               ("enc", h, w, k)))
            out = p["step"][k](y_q, means, y_hat, ctx)
            if k < 3:
                y_hat, means, packed_idx, packed_pos, count, cond = out
            else:
                y_hat = out
        x_hat = p["synthesis"](y_hat, q_dec, qp_arr)

        return {"p": p, "handles": handles, "counts": counts,
                "z_int8": z_int8, "qp": int(qp), "x_hat": x_hat}

    # ------------------------------------------------------------- decode

    def _decompress_gen(self, decoder, bit_stream, qp, h, w, ec_part, out):
        assert 0 <= int(qp) < self.cfg.qp_num, f"qp {qp} out of range"
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw, n_cand = p["dims"]
        ch_z, ch_y = self.cfg.ch_z, self.cfg.ch_y
        qp_arr = jnp.int32(qp)

        decoder.set_parallel(ec_part)
        decoder.set_stream(bit_stream)
        z_num = zh * zw * ch_z
        decoder.decode_z(z_num, int(qp) * ch_z, ch_z)
        yield
        z_int8 = jnp.asarray(decoder.get_decoded().reshape(1, zh, zw, ch_z))

        (means, ctx, _q_enc, q_dec, packed_idx, packed_pos, count,
         cond) = p["prior0"](z_int8)
        y_hat = jnp.zeros((1, yh, yw, ch_y), jnp.float32)

        start_copies(count)
        handle = self._fetcher.start(p["slice"], packed_idx,
                                     ("dec", h, w, 0))
        for k in range(4):
            yield
            c = int(count)
            idx_np = self._fetcher.finish(p["slice"], handle, c, np.uint8)
            if c > 0:
                decoder.decode_y(idx_np)
                decoded = decoder.get_decoded()
                pad = np.zeros(_round_bucket(c, n_cand), np.int8)
                pad[:c] = decoded
            else:
                pad = np.zeros(min(BUCKET, n_cand), np.int8)
            y_q = p["expand"](jnp.asarray(pad), packed_pos)
            step_out = p["step"][k](y_q, means, y_hat, ctx)
            if k < 3:
                y_hat, means, packed_idx, packed_pos, count, cond = step_out
                start_copies(count)
                handle = self._fetcher.start(p["slice"], packed_idx,
                                             ("dec", h, w, k + 1))
            else:
                y_hat = step_out

        out["x_hat"] = p["synthesis"](y_hat, q_dec, qp_arr)
