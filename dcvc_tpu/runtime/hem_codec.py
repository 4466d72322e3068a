"""DCVC-HEM bitstream inference runtime (dual cross-checkerboard prior).

Reference: DCVC-family/DCVC-HEM/src/models/video_model.py:259-372 and
common_model.py:102-200 (compress/decompress_dual_prior).

Same architecture as the FM runtime (fm_codec.py): shared enc/dec stage
programs, dense checkerboard write grids in the reference's CHW payload
order, indexed rANS.  The dual prior's two write grids are exactly the
UF 2x phase terms (core/masks.py phase_terms_2x): step 0 codes half-0
channels at the (0,0)/(1,1) checkerboard + half-1 at (0,1)/(1,0); step 1
swaps.  Rate control: continuous (mv_)y_q_scale scalars are traced, so
one program serves the whole rate range (video_model.py:251-257).

Stream order (video_model.py:303-309): z_mv, mv part 0, mv part 1, z,
y part 0, y part 1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import phase_terms_2x, phase_split, phase_merge
from ..core.padding import get_padding_size
from ..entropy.legacy import (LegacyGaussianTable, legacy_bitparm_bank,
                              build_z_indexes)
from .. import rans
from .fetch import start_copies
from .fm_codec import cand_to_chw, chw_to_cand


class DMCHEMCodec:
    """compress/decompress one P frame against the 4-tensor DPB
    (ref_frame, ref_feature, ref_y, ref_mv_y)."""

    def __init__(self, model, params):
        self.model = model
        self.cfg = model.cfg
        self.params = params

        c = self.cfg
        self.gauss = LegacyGaussianTable("laplace")  # video_model.py:133
        y_cdf, y_len, y_off = self.gauss.compute_cdf_bank()
        z_cdf, z_len, z_off = legacy_bitparm_bank(
            params["bit_estimator_z"], 1, c.ch_n)
        zmv_cdf, zmv_len, zmv_off = legacy_bitparm_bank(
            params["bit_estimator_z_mv"], 1, c.ch_n)

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
        from ..legacy.dcvc_hem import DMCHEM, HEM_CONFIG
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or HEM_CONFIG
        model = DMCHEM(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        dpb0 = {"ref_frame": x, "ref_feature": None,
                "ref_y": None, "ref_mv_y": None}
        dpb1 = {"ref_frame": x,
                "ref_feature": jnp.zeros((1, 64, 64, cfg.ch_n), dtype),
                "ref_y": jnp.zeros((1, 4, 4, cfg.ch_m), dtype),
                "ref_mv_y": jnp.zeros((1, 4, 4, cfg.ch_mv), dtype)}
        init0 = jax.jit(lambda r1, r2: model.init(
            {"params": r1}, x, dpb0, rng=r2))
        init1 = jax.jit(lambda r1, r2: model.init(
            {"params": r1}, x, dpb1, rng=r2))
        r1, r2, r3 = jax.random.split(rng, 3)
        p0 = init0(r1, r2)["params"]
        p1 = init1(r1, r3)["params"]

        def merge(a, b):
            out = dict(a)
            for k, v in b.items():
                if k not in out:
                    out[k] = v
                elif hasattr(v, "items"):
                    out[k] = merge(out[k], v)
            return out

        params = merge(dict(p0), dict(p1))
        if init_scale != 1.0:
            def scale_kernels(path, leaf):
                if path[-1].key == "kernel":
                    return leaf * init_scale
                return leaf
            params = jax.tree_util.tree_map_with_path(scale_kernels, params)
        return cls(model, params)

    # --------------------------------------------------------- DPB state

    def clear_dpb(self):
        self.dpb = {"ref_frame": None, "ref_feature": None,
                    "ref_y": None, "ref_mv_y": None}

    def set_ref_frame(self, frame, h=None, w=None):
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
        pad_r, pad_b = get_padding_size(h, w, 64)
        ph, pw = h + pad_b, w + pad_r
        yh, yw = ph // 16, pw // 16
        zh, zw = ph // 64, pw // 64
        terms_y = phase_terms_2x(cfg.ch_m)
        terms_mv = phase_terms_2x(cfg.ch_mv)
        model = self.model
        variables = {"params": self.params}

        def _apply(method, *args):
            return model.apply(variables, *args, method=method)

        @jax.jit
        def pad_x(x):
            return jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                           mode="edge")

        def _build_idx(scales, terms):
            sc = phase_split(scales, terms).astype(jnp.float32)
            return self.gauss.build_indexes(sc).astype(jnp.uint8)

        @jax.jit
        def mv_analysis(x, ref_frame, qs):
            return _apply(type(model).mv_analysis, x, ref_frame, qs)

        def _prior(side):
            prior_m = (type(model).mv_prior if side == "mv"
                       else type(model).ctx_prior)
            terms = terms_mv if side == "mv" else terms_y

            @jax.jit
            def fn(z_int, ref_y, extra):
                if side == "mv":
                    q_step, scales, means = _apply(prior_m, z_int, ref_y)
                else:
                    q_step, scales, means = _apply(prior_m, z_int, extra,
                                                   ref_y)
                idx0 = _build_idx(scales, terms[0])
                return q_step, scales, means, idx0
            return fn

        def _enc_quant(side, step):
            terms = (terms_mv if side == "mv" else terms_y)[step]

            @jax.jit
            def fn(y, q_step, means):
                y_c = phase_split(y / q_step.astype(jnp.float32), terms)
                m_c = phase_split(means, terms).astype(jnp.float32)
                return jnp.clip(jnp.round(y_c - m_c),
                                -30000, 30000).astype(jnp.int16)
            return fn

        def _step0(side):
            terms = terms_mv if side == "mv" else terms_y
            ch = cfg.ch_mv if side == "mv" else cfg.ch_m
            spatial_m = (type(model).mv_spatial if side == "mv"
                         else type(model).ctx_spatial)

            @jax.jit
            def fn(y_q_c, q_step, scales, means):
                m_c = phase_split(means, terms[0]).astype(jnp.float32)
                y_hat0 = phase_merge(y_q_c.astype(jnp.float32) + m_c,
                                     terms[0], ch)
                scales1, means1 = _apply(spatial_m, y_hat0, q_step,
                                         scales, means)
                idx1 = _build_idx(scales1, terms[1])
                return y_hat0, means1, idx1
            return fn

        def _step1(side):
            terms = terms_mv if side == "mv" else terms_y
            ch = cfg.ch_mv if side == "mv" else cfg.ch_m

            @jax.jit
            def fn(y_q_c, means1, y_hat0, q_step):
                m_c = phase_split(means1, terms[1]).astype(jnp.float32)
                y_hat1 = phase_merge(y_q_c.astype(jnp.float32) + m_c,
                                     terms[1], ch)
                return (y_hat0 + y_hat1) * q_step.astype(jnp.float32)
            return fn

        @jax.jit
        def mv_synthesis(mv_y_hat_acc, qs):
            return _apply(type(model).mv_synthesis, mv_y_hat_acc, qs)

        def _mc(has_feature):
            @jax.jit
            def fn(ref_frame, ref_feature, mv_hat):
                return _apply(type(model).mc, ref_frame, ref_feature,
                              has_feature, mv_hat)
            return fn

        @jax.jit
        def ctx_analysis(x, c1, c2, c3, qs):
            return _apply(type(model).ctx_analysis, x, c1, c2, c3, qs)

        @jax.jit
        def synthesis(y_hat_acc, c1, c2, c3, qs):
            y_hat, recon, feature = _apply(type(model).synthesis,
                                           y_hat_acc, c1, c2, c3, qs)
            return y_hat, recon[:, :h, :w, :], feature

        progs = {
            "pad_x": pad_x,
            "mv_analysis": mv_analysis,
            "mv_prior": _prior("mv"),
            "mv_enc_quant": [_enc_quant("mv", k) for k in range(2)],
            "mv_step0": _step0("mv"),
            "mv_step1": _step1("mv"),
            "mv_synthesis": mv_synthesis,
            "mc": {f: _mc(f) for f in (False, True)},
            "ctx_analysis": ctx_analysis,
            "ctx_prior": _prior("ctx"),
            "ctx_enc_quant": [_enc_quant("ctx", k) for k in range(2)],
            "ctx_step0": _step0("ctx"),
            "ctx_step1": _step1("ctx"),
            "synthesis": synthesis,
            "dims": (ph, pw, yh, yw, zh, zw),
            "terms": {"mv": terms_mv, "ctx": terms_y},
        }
        self._programs[key] = progs
        return progs

    def _zeros_ref(self, which, yh, yw):
        ch = {"ref_y": self.cfg.ch_m, "ref_mv_y": self.cfg.ch_mv}[which]
        ref = self.dpb[which]
        if ref is None:
            return jnp.zeros((1, yh, yw, ch), jnp.float32)
        return ref

    def _run_side(self, p, side, z_int, ref_y, extra, qs, y=None,
                  decode_fn=None):
        """Dual-prior ladder for one side.  Encoder mode (y given) returns
        (y_hat_acc, [(y_q_c, idx)] x2); decoder mode uses decode_fn."""
        cfg = self.cfg
        ch = cfg.ch_mv if side == "mv" else cfg.ch_m
        _, _, yh, yw, _, _ = p["dims"]
        q_step, scales, means, idx0 = p[f"{side}_prior" if side == "mv"
                                        else "ctx_prior"](z_int, ref_y,
                                                          extra)
        quants = p["mv_enc_quant" if side == "mv" else "ctx_enc_quant"]
        step0 = p["mv_step0" if side == "mv" else "ctx_step0"]
        step1 = p["mv_step1" if side == "mv" else "ctx_step1"]

        outs = []
        if decode_fn is None:
            y_q0 = quants[0](y, q_step, means)
            outs.append((y_q0, idx0))
        else:
            y_q0 = jnp.asarray(decode_fn(np.asarray(idx0), 0)
                               .reshape(1, yh // 2, yw // 2, 2 * ch))
        y_hat0, means1, idx1 = step0(y_q0, q_step, scales, means)
        if decode_fn is None:
            y_q1 = quants[1](y, q_step, means1)
            outs.append((y_q1, idx1))
        else:
            y_q1 = jnp.asarray(decode_fn(np.asarray(idx1), 1)
                               .reshape(1, yh // 2, yw // 2, 2 * ch))
        y_hat_acc = step1(y_q1, means1, y_hat0, q_step)
        return y_hat_acc, outs

    # ------------------------------------------------------------ encode

    def compress(self, x, mv_y_q_scale, y_q_scale, h=None, w=None):
        """x: (1, H, W, 3) RGB f32 [0, 1].  q scales: floats (rate
        control).  Returns dict(bit_stream, x_hat)."""
        assert self.dpb["ref_frame"] is not None, "DPB empty"
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        dpb = self.dpb
        qs_mv = jnp.float32(mv_y_q_scale)
        qs_y = jnp.float32(y_q_scale)
        xp = p["pad_x"](x)

        mv_y, mv_z_int = p["mv_analysis"](xp, dpb["ref_frame"], qs_mv)
        start_copies(mv_z_int)
        mv_ref = self._zeros_ref("ref_mv_y", yh, yw)
        mv_y_hat_acc, mv_outs = self._run_side(p, "mv", mv_z_int, mv_ref,
                                               None, qs_mv, y=mv_y)
        mv_y_hat, mv_hat = p["mv_synthesis"](mv_y_hat_acc, qs_mv)

        has_feature = dpb["ref_feature"] is not None
        feat = dpb["ref_feature"] if has_feature else dpb["ref_frame"]
        c1, c2, c3 = p["mc"][has_feature](dpb["ref_frame"], feat, mv_hat)

        y, z_int = p["ctx_analysis"](xp, c1, c2, c3, qs_y)
        start_copies(z_int)
        y_ref = self._zeros_ref("ref_y", yh, yw)
        y_hat_acc, y_outs = self._run_side(p, "ctx", z_int, y_ref, c3,
                                           qs_y, y=y)
        y_hat, x_hat, feature = p["synthesis"](y_hat_acc, c1, c2, c3, qs_y)

        self.dpb = {"ref_frame": p["pad_x"](x_hat), "ref_feature": feature,
                    "ref_y": y_hat, "ref_mv_y": mv_y_hat}

        # host entropy: z_mv, mv parts, z, y parts (video_model.py:303-309)
        for (q, i) in mv_outs + y_outs:
            start_copies(q, i)
        enc = self.encoder
        enc.reset()
        mv_z_np = np.asarray(mv_z_int)[0].transpose(2, 0, 1).reshape(-1)
        z_np = np.asarray(z_int)[0].transpose(2, 0, 1).reshape(-1)
        enc.encode_with_indexes(
            mv_z_np, build_z_indexes(0, self.cfg.ch_n, zh, zw), self.g_zmv)
        for k, (y_q, idx) in enumerate(mv_outs):
            enc.encode_with_indexes(
                cand_to_chw(np.asarray(y_q), p["terms"]["mv"][k]),
                cand_to_chw(np.asarray(idx), p["terms"]["mv"][k])
                .astype(np.int16), self.g_y)
        enc.encode_with_indexes(
            z_np, build_z_indexes(0, self.cfg.ch_n, zh, zw), self.g_z)
        for k, (y_q, idx) in enumerate(y_outs):
            enc.encode_with_indexes(
                cand_to_chw(np.asarray(y_q), p["terms"]["ctx"][k]),
                cand_to_chw(np.asarray(idx), p["terms"]["ctx"][k])
                .astype(np.int16), self.g_y)
        enc.flush()
        return {"bit_stream": enc.get_encoded_stream(), "x_hat": x_hat}

    # ------------------------------------------------------------ decode

    def decompress(self, bit_stream, mv_y_q_scale, y_q_scale, h, w):
        assert self.dpb["ref_frame"] is not None, "DPB empty"
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        cfg = self.cfg
        dpb = self.dpb
        qs_mv = jnp.float32(mv_y_q_scale)
        qs_y = jnp.float32(y_q_scale)
        dec = self.decoder
        dec.set_stream(bit_stream)

        def make_decode_fn(side, group):
            terms = p["terms"][side]

            def decode_fn(idx_np, k):
                ind = cand_to_chw(idx_np, terms[k]).astype(np.int16)
                sym = dec.decode_stream(ind, group)
                return chw_to_cand(sym, terms[k], yh // 2, yw // 2)
            return decode_fn

        mv_z_np = dec.decode_stream(
            build_z_indexes(0, cfg.ch_n, zh, zw), self.g_zmv)
        mv_z_int = jnp.asarray(mv_z_np.reshape(cfg.ch_n, zh, zw)
                               .transpose(1, 2, 0)[None])
        mv_ref = self._zeros_ref("ref_mv_y", yh, yw)
        mv_y_hat_acc, _ = self._run_side(
            p, "mv", mv_z_int, mv_ref, None, qs_mv,
            decode_fn=make_decode_fn("mv", self.g_y))
        mv_y_hat, mv_hat = p["mv_synthesis"](mv_y_hat_acc, qs_mv)

        has_feature = dpb["ref_feature"] is not None
        feat = dpb["ref_feature"] if has_feature else dpb["ref_frame"]
        c1, c2, c3 = p["mc"][has_feature](dpb["ref_frame"], feat, mv_hat)

        z_np = dec.decode_stream(
            build_z_indexes(0, cfg.ch_n, zh, zw), self.g_z)
        z_int = jnp.asarray(z_np.reshape(cfg.ch_n, zh, zw)
                            .transpose(1, 2, 0)[None])
        y_ref = self._zeros_ref("ref_y", yh, yw)
        y_hat_acc, _ = self._run_side(
            p, "ctx", z_int, y_ref, c3, qs_y,
            decode_fn=make_decode_fn("ctx", self.g_y))
        y_hat, x_hat, feature = p["synthesis"](y_hat_acc, c1, c2, c3, qs_y)

        self.dpb = {"ref_frame": p["pad_x"](x_hat), "ref_feature": feature,
                    "ref_y": y_hat, "ref_mv_y": mv_y_hat}
        return {"x_hat": x_hat}
