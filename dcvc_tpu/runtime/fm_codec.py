"""DCVC-FM bitstream inference runtime (two-stream mv + contextual).

Reference: DCVC-family/DCVC-FM/src/models/video_model.py:396-500 and
common_model.py:231-325 (forward/compress/decompress_four_part_prior).

Architecture follows the UF runtimes (video_codec.py): every tensor that
influences symbol decisions or reconstruction is computed by programs
SHARED between encoder and decoder; only integer tensors (z int16, per-
step y_q int16 grids) cross the boundary.  The legacy family codes DENSE
grids (no skip), so all shapes are static and no count round-trips
exist.  Symbols ride the indexed rANS backend (rans.IndexedRans*) with
the reference's CDF groups: z bitparm banks + a 256-level laplace scale
table; payload symbol order matches the reference's CHW write grids
(combine_for_writing, common_model.py:219-223).

Quadtree structure: the legacy four-part masks (get_mask_four_parts,
common_model.py:184-216) are exactly the UF phase terms
(core/masks.py phase_terms_4x), so the candidate-domain machinery is
reused; the write grid per step is the dense phase-collapsed (C/4, H, W)
plane.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import phase_terms_4x, phase_split, phase_merge
from ..core.padding import get_padding_size
from ..entropy.legacy import (LegacyGaussianTable, legacy_bitparm_bank,
                              build_z_indexes)
from .. import rans
from .fetch import start_copies


def cand_to_chw(cand, terms):
    """Candidate (H/2, W/2, sum-of-term-widths) -> the reference's dense
    CHW write order (Cw*H*W,), Cw = per-term channel width.

    Candidate channels are laid out SEQUENTIALLY in term order
    (core/masks.py phase_split); every spatial phase of the write grid is
    covered by exactly one term (combine_for_writing /
    compress_dual_prior write grids)."""
    h2, w2, c = cand.shape[-3:]
    cand = np.asarray(cand).reshape(h2, w2, c)
    cw = terms[0][2] - terms[0][1]
    out = np.empty((cw, 2 * h2, 2 * w2), cand.dtype)
    off = 0
    for ((py, px), lo, hi) in terms:
        n = hi - lo
        assert n == cw, "write-grid terms must share one channel width"
        out[:, py::2, px::2] = cand[:, :, off:off + n].transpose(2, 0, 1)
        off += n
    return out.reshape(-1)


def chw_to_cand(flat, terms, h2, w2, dtype=np.int16):
    """Inverse of cand_to_chw."""
    cw = terms[0][2] - terms[0][1]
    grid = np.asarray(flat, dtype).reshape(cw, 2 * h2, 2 * w2)
    cand = np.empty((h2, w2, cw * len(terms)), dtype)
    off = 0
    for ((py, px), lo, hi) in terms:
        cand[:, :, off:off + cw] = grid[:, py::2, px::2].transpose(1, 2, 0)
        off += cw
    return cand


class DMCFMCodec:
    """Holds params + CDF banks + compiled-program cache; compress /
    decompress one P frame against the DPB (reference DMC.compress,
    video_model.py:396-453).

    Also the base for the other two-stream four-part family members
    (DCVC-DC, runtime/dc_codec.py): subclasses override Z_QP_NUM /
    _z_channels() and their model provides the same stage-method
    surface."""

    Z_QP_NUM = 2        # FM bitparm banks carry 2 qp rows
    DISTRIBUTION = "laplace"

    def _z_channels(self):
        """(mv_z_channels, ctx_z_channels)."""
        return self.cfg.ch_mv_z, self.cfg.ch_z

    def __init__(self, model, params):
        self.model = model
        self.cfg = model.cfg
        self.params = params

        ch_mv_z, ch_z = self._z_channels()
        self.ch_mv_z, self.ch_z = ch_mv_z, ch_z
        self.gauss = LegacyGaussianTable(self.DISTRIBUTION)
        y_cdf, y_len, y_off = self.gauss.compute_cdf_bank()
        z_cdf, z_len, z_off = legacy_bitparm_bank(
            params["bit_estimator_z"], self.Z_QP_NUM, ch_z)
        zmv_cdf, zmv_len, zmv_off = legacy_bitparm_bank(
            params["bit_estimator_z_mv"], self.Z_QP_NUM, ch_mv_z)

        self.encoder = rans.IndexedRansEncoder()
        self.decoder = rans.IndexedRansDecoder()
        for coder in (self.encoder, self.decoder):
            gy = coder.add_cdf(y_cdf, y_len, y_off)
            gz = coder.add_cdf(z_cdf, z_len, z_off)
            gzmv = coder.add_cdf(zmv_cdf, zmv_len, zmv_off)
        self.g_y, self.g_z, self.g_zmv = gy, gz, gzmv

        self._programs = {}
        self.clear_dpb()

    @classmethod
    def init_random(cls, rng=None, cfg=None, dtype=jnp.float32,
                    init_scale=1.0):
        from ..legacy.dcvc_fm import DMCFM, FM_CONFIG
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or FM_CONFIG
        model = DMCFM(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        dpb0 = {"ref_frame": x, "ref_feature": None,
                "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
        dpb1 = {"ref_frame": x,
                "ref_feature": jnp.zeros((1, 64, 64, cfg.ch_1x), dtype),
                "ref_mv_feature": jnp.zeros((1, 16, 16, cfg.ch_mv), dtype),
                "ref_y": jnp.zeros((1, 4, 4, cfg.ch_16x), dtype),
                "ref_mv_y": jnp.zeros((1, 4, 4, cfg.ch_mv), dtype)}
        init0 = jax.jit(lambda r1, r2: model.init(
            {"params": r1}, x, dpb0, 0, 0, r2))
        init1 = jax.jit(lambda r1, r2: model.init(
            {"params": r1}, x, dpb1, 0, 1, r2))
        r1, r2, r3 = jax.random.split(rng, 3)
        p0 = init0(r1, r2)["params"]
        p1 = init1(r1, r3)["params"]

        def merge(a, b):
            """Deep merge: branch-dependent params (adaptor_0/adaptor_1,
            fusion variants) live INSIDE submodules, so merge recursively."""
            out = dict(a)
            for k, v in b.items():
                if k not in out:
                    out[k] = v
                elif isinstance(v, dict) or hasattr(v, "items"):
                    out[k] = merge(out[k], v)
            return out

        params = merge(dict(p0), dict(p1))
        # the init traces exercise only feature_adaptor_1 (fa_idx=1);
        # clone it into the other refresh-schedule slots so every
        # variant program has params (real checkpoints overwrite them)
        proto = params.get("feature_adaptor_1")
        if proto is not None:
            for i in (0, 2):
                params.setdefault(f"feature_adaptor_{i}",
                                  jax.tree.map(lambda v: v, proto))
        if init_scale != 1.0:
            def scale_kernels(path, leaf):
                if path[-1].key in ("kernel", "fusion_kernel"):
                    return leaf * init_scale
                return leaf
            params = jax.tree_util.tree_map_with_path(scale_kernels, params)
        return cls(model, params)

    # --------------------------------------------------------- DPB state

    def clear_dpb(self):
        self.dpb = {"ref_frame": None, "ref_feature": None,
                    "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}

    def set_ref_frame(self, frame, h=None, w=None):
        """Seed the DPB with an intra reconstruction (1, H, W, 3) in
        [0, 1]."""
        frame = jnp.asarray(frame)
        h = frame.shape[1] if h is None else h
        w = frame.shape[2] if w is None else w
        p = self._get_programs(h, w)
        self.clear_dpb()
        self.dpb["ref_frame"] = p["pad_x"](frame)

    # ---------------------------------------------------------- programs

    def _get_programs(self, h, w):
        key = (h, w)
        if key in self._programs:
            return self._programs[key]

        cfg = self.cfg
        # reference pads frames to 16 (video_model.py encode path); we pad
        # to 32 so the /16 latent grid is always EVEN — the quadtree
        # phase machinery splits 2x2 subgrids.  Standard eval resolutions
        # produce even grids either way; odd-grid streams deviate from
        # the reference geometry (extra padded latent column/row).
        pad_r, pad_b = get_padding_size(h, w, 32)
        ph, pw = h + pad_b, w + pad_r
        yh, yw = ph // 16, pw // 16
        zh, zw = (yh + 3) // 4, (yw + 3) // 4
        terms_y = phase_terms_4x(cfg.ch_16x)
        terms_mv = phase_terms_4x(cfg.ch_mv)
        model = self.model
        variables = {"params": self.params}

        def _apply(method, *args):
            return model.apply(variables, *args, method=method)

        @jax.jit
        def pad_x(x):
            return jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                           mode="edge")

        # ------------------------------------------------------ mv side

        def _mv_analysis(has_mv_feat):
            @jax.jit
            def fn(x, ref_frame, ref_mv_feature, qi):
                return _apply(type(model).mv_analysis, x, ref_frame,
                              ref_mv_feature if has_mv_feat else None, qi)
            return fn

        def _build_idx(scales, terms):
            """Per-step candidate scale-table indexes (uint8)."""
            sc = phase_split(scales, terms).astype(jnp.float32)
            return self.gauss.build_indexes(sc).astype(jnp.uint8)

        def _prior0(side, has_ref):
            prior_m = (type(model).mv_prior0 if side == "mv"
                       else type(model).ctx_prior0)
            terms = terms_mv if side == "mv" else terms_y

            @jax.jit
            def fn(z_int, ref_y, extra):
                if side == "mv":
                    out = _apply(prior_m, z_int,
                                 ref_y if has_ref else None, yh, yw)
                else:
                    out = _apply(prior_m, z_int,
                                 ref_y if has_ref else None, extra, yh, yw)
                q_enc, q_dec, scales, means, spctx = out
                idx0 = _build_idx(scales, terms[0])
                return q_enc, q_dec, scales, means, spctx, idx0
            return fn

        def _enc_quant(side, step):
            terms = (terms_mv if side == "mv" else terms_y)[step]

            @jax.jit
            def fn(y, q_enc, scales_unused, means):
                y_c = phase_split(y * q_enc.astype(jnp.float32), terms)
                m_c = phase_split(means, terms).astype(jnp.float32)
                y_q = jnp.round(y_c - m_c)
                return jnp.clip(y_q, -30000, 30000).astype(jnp.int16)
            return fn

        def _step(side, step):
            terms = terms_mv if side == "mv" else terms_y
            ch = cfg.ch_mv if side == "mv" else cfg.ch_16x
            prior_step_m = (type(model).mv_prior_step if side == "mv"
                            else type(model).ctx_prior_step)
            last = step == 3

            @jax.jit
            def fn(y_q_int16, means, y_hat_so_far, spctx):
                m_c = phase_split(means, terms[step]).astype(jnp.float32)
                contrib = y_q_int16.astype(jnp.float32) + m_c
                y_hat_so_far = y_hat_so_far + phase_merge(
                    contrib, terms[step], ch)
                if last:
                    return y_hat_so_far
                scales, means_next = _apply(prior_step_m, spctx,
                                            y_hat_so_far, step + 1)
                idx = _build_idx(scales, terms[step + 1])
                return y_hat_so_far, means_next, idx
            return fn

        @jax.jit
        def mv_synthesis(y_hat_so_far, q_dec, qi):
            mv_y_hat = y_hat_so_far * q_dec.astype(jnp.float32)
            mv_hat, mv_feature = _apply(type(model).mv_synthesis,
                                        mv_y_hat, qi)
            return mv_y_hat, mv_hat, mv_feature

        def _mc(has_feature, fa_idx):
            @jax.jit
            def fn(ref_frame, ref_feature, mv_hat):
                return _apply(type(model).mc, ref_frame,
                              ref_feature if has_feature else None,
                              fa_idx, mv_hat)
            return fn

        def _ctx_analysis():
            @jax.jit
            def fn(x, c1, c2, c3, qi):
                return _apply(type(model).ctx_analysis, x, c1, c2, c3, qi)
            return fn

        @jax.jit
        def synthesis(y_hat_so_far, q_dec, c1, c2, c3, qi):
            y_hat = y_hat_so_far * q_dec.astype(jnp.float32)
            x_hat, feature = _apply(type(model).synthesis, y_hat,
                                    c1, c2, c3, qi)
            return y_hat, x_hat[:, :h, :w, :], feature

        progs = {
            "pad_x": pad_x,
            "mv_analysis": {m: _mv_analysis(m) for m in (False, True)},
            "mv_prior0": {m: _prior0("mv", m) for m in (False, True)},
            "mv_enc_quant": [_enc_quant("mv", k) for k in range(4)],
            "mv_step": [_step("mv", k) for k in range(4)],
            "mv_synthesis": mv_synthesis,
            "mc": {(f, i): _mc(f, i)
                   for f in (False, True) for i in range(3)},
            "ctx_analysis": _ctx_analysis(),
            "ctx_prior0": {m: _prior0("ctx", m) for m in (False, True)},
            "ctx_enc_quant": [_enc_quant("ctx", k) for k in range(4)],
            "ctx_step": [_step("ctx", k) for k in range(4)],
            "synthesis": synthesis,
            "dims": (ph, pw, yh, yw, zh, zw),
            "terms": {"mv": terms_mv, "ctx": terms_y},
        }
        self._programs[key] = progs
        return progs

    # ----------------------------------------------------------- helpers

    def _run_side(self, p, side, z_int, has_ref, ref_y, extra, y=None,
                  q_index=0, decode_fn=None):
        """Run one coding side's four-part ladder.

        Encoder mode (y given): returns (y_hat_so_far, q_dec,
        [(y_q_cand, idx_cand), ...]).  Decoder mode (decode_fn given):
        decode_fn(idx_cand_np, step) -> y_q candidate np int16."""
        cfg = self.cfg
        ch = cfg.ch_mv if side == "mv" else cfg.ch_16x
        _, _, yh, yw, _, _ = p["dims"]
        prior0 = p[f"{side if side == 'mv' else 'ctx'}_prior0"][has_ref]
        steps = p["mv_step" if side == "mv" else "ctx_step"]
        quants = p["mv_enc_quant" if side == "mv" else "ctx_enc_quant"]

        q_enc, q_dec, scales, means, spctx, idx = prior0(z_int, ref_y,
                                                         extra)
        y_hat = jnp.zeros((1, yh, yw, ch), jnp.float32)
        outs = []
        for k in range(4):
            if decode_fn is None:
                y_q = quants[k](y, q_enc, scales, means)
                outs.append((y_q, idx))
            else:
                y_q_np = decode_fn(np.asarray(idx), k)
                y_q = jnp.asarray(y_q_np.reshape(1, yh // 2, yw // 2, ch))
            out = steps[k](y_q, means, y_hat, spctx)
            if k < 3:
                y_hat, means, idx = out
            else:
                y_hat = out
        return y_hat, q_dec, outs

    # ------------------------------------------------------------ encode

    def compress(self, x, q_index, fa_idx=0, h=None, w=None):
        """x: (1, H, W, 3) RGB f32 in [0, 1].  Returns dict(bit_stream,
        x_hat, dpb updated in place)."""
        assert self.dpb["ref_frame"] is not None, "DPB empty"
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        dpb = self.dpb
        xp = p["pad_x"](x)

        has_mv_feat = dpb["ref_mv_feature"] is not None
        mv_dummy = (dpb["ref_mv_feature"] if has_mv_feat
                    else dpb["ref_frame"])
        qi = jnp.int32(q_index)
        mv_y, mv_z_int = p["mv_analysis"][has_mv_feat](
            xp, dpb["ref_frame"], mv_dummy, qi)
        start_copies(mv_z_int)

        has_ref_mv_y = dpb["ref_mv_y"] is not None
        mv_ref = dpb["ref_mv_y"] if has_ref_mv_y else mv_y  # dummy ok
        mv_y_hat_acc, mv_q_dec, mv_outs = self._run_side(
            p, "mv", mv_z_int, has_ref_mv_y, mv_ref, None, y=mv_y)
        mv_y_hat, mv_hat, mv_feature = p["mv_synthesis"](mv_y_hat_acc,
                                                         mv_q_dec, qi)

        has_feature = dpb["ref_feature"] is not None
        feat_dummy = dpb["ref_feature"] if has_feature else dpb["ref_frame"]
        c1, c2, c3 = p["mc"][(has_feature, fa_idx if has_feature else 0)](
            dpb["ref_frame"], feat_dummy, mv_hat)

        y, z_int = p["ctx_analysis"](xp, c1, c2, c3, qi)
        start_copies(z_int)
        has_ref_y = dpb["ref_y"] is not None
        y_ref = dpb["ref_y"] if has_ref_y else y
        y_hat_acc, y_q_dec, y_outs = self._run_side(
            p, "ctx", z_int, has_ref_y, y_ref, c3, y=y)
        y_hat, x_hat, feature = p["synthesis"](y_hat_acc, y_q_dec,
                                               c1, c2, c3, qi)

        self.dpb = {"ref_frame": p["pad_x"](x_hat), "ref_feature": feature,
                    "ref_mv_feature": mv_feature, "ref_y": y_hat,
                    "ref_mv_y": mv_y_hat}

        # ---------------- host entropy (reference order,
        # video_model.py:427-437: z_mv, z, mv parts 0-3, y parts 0-3)
        for (q, i) in mv_outs + y_outs:
            start_copies(q, i)
        enc = self.encoder
        enc.reset()
        mv_z_np = np.asarray(mv_z_int)[0].transpose(2, 0, 1).reshape(-1)
        z_np = np.asarray(z_int)[0].transpose(2, 0, 1).reshape(-1)
        enc.encode_with_indexes(
            mv_z_np, build_z_indexes(0, self.ch_mv_z, zh, zw),
            self.g_zmv)
        enc.encode_with_indexes(
            z_np, build_z_indexes(0, self.ch_z, zh, zw), self.g_z)
        for side, outs in (("mv", mv_outs), ("ctx", y_outs)):
            terms = p["terms"][side]
            for k, (y_q, idx) in enumerate(outs):
                sym = cand_to_chw(np.asarray(y_q), terms[k])
                ind = cand_to_chw(np.asarray(idx), terms[k]).astype(np.int16)
                enc.encode_with_indexes(sym, ind, self.g_y)
        enc.flush()
        return {"bit_stream": enc.get_encoded_stream(), "x_hat": x_hat}

    # ------------------------------------------------------------ decode

    def decompress(self, bit_stream, q_index, h, w, fa_idx=0):
        assert self.dpb["ref_frame"] is not None, "DPB empty"
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        cfg = self.cfg
        dpb = self.dpb
        dec = self.decoder
        dec.set_stream(bit_stream)
        qi = jnp.int32(q_index)

        mv_z_np = dec.decode_stream(
            build_z_indexes(0, self.ch_mv_z, zh, zw), self.g_zmv)
        z_np = dec.decode_stream(
            build_z_indexes(0, self.ch_z, zh, zw), self.g_z)
        mv_z_int = jnp.asarray(mv_z_np.reshape(self.ch_mv_z, zh, zw)
                               .transpose(1, 2, 0)[None])
        z_int = jnp.asarray(z_np.reshape(self.ch_z, zh, zw)
                            .transpose(1, 2, 0)[None])

        def make_decode_fn(side):
            terms = p["terms"][side]

            def decode_fn(idx_np, k):
                ind = cand_to_chw(idx_np, terms[k]).astype(np.int16)
                sym = dec.decode_stream(ind, self.g_y)
                return chw_to_cand(sym, terms[k], yh // 2, yw // 2)
            return decode_fn

        has_ref_mv_y = dpb["ref_mv_y"] is not None
        mv_ref = (dpb["ref_mv_y"] if has_ref_mv_y
                  else jnp.zeros((1, yh, yw, cfg.ch_mv), jnp.float32))
        mv_y_hat_acc, mv_q_dec, _ = self._run_side(
            p, "mv", mv_z_int, has_ref_mv_y, mv_ref, None,
            decode_fn=make_decode_fn("mv"))
        mv_y_hat, mv_hat, mv_feature = p["mv_synthesis"](mv_y_hat_acc,
                                                         mv_q_dec, qi)

        has_feature = dpb["ref_feature"] is not None
        feat_dummy = dpb["ref_feature"] if has_feature else dpb["ref_frame"]
        c1, c2, c3 = p["mc"][(has_feature, fa_idx if has_feature else 0)](
            dpb["ref_frame"], feat_dummy, mv_hat)

        has_ref_y = dpb["ref_y"] is not None
        y_ref = (dpb["ref_y"] if has_ref_y
                 else jnp.zeros((1, yh, yw, cfg.ch_16x), jnp.float32))
        y_hat_acc, y_q_dec, _ = self._run_side(
            p, "ctx", z_int, has_ref_y, y_ref, c3,
            decode_fn=make_decode_fn("ctx"))
        y_hat, x_hat, feature = p["synthesis"](y_hat_acc, y_q_dec,
                                               c1, c2, c3, qi)

        self.dpb = {"ref_frame": p["pad_x"](x_hat), "ref_feature": feature,
                    "ref_mv_feature": mv_feature, "ref_y": y_hat,
                    "ref_mv_y": mv_y_hat}
        return {"x_hat": x_hat}
