"""DCVC-TCM bitstream inference runtime.

Reference: DCVC-family/DCVC-TCM/src/models/video_net_dmc.py:315-380.
Single-shot dense gaussian coding (no spatial steps): stream order
z_mv, mv_y, z, y; every grid is coded fully in CHW order.  Shared
enc/dec stage programs (see fm_codec.py for the architecture notes).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..core.padding import get_padding_size
from ..entropy.legacy import (LegacyGaussianTable, legacy_bitparm_bank,
                              build_z_indexes)
from .. import rans
from .fetch import start_copies


def _to_chw(x):
    """(1, H, W, C) device/np -> flat CHW np."""
    return np.asarray(x)[0].transpose(2, 0, 1).reshape(-1)


def _from_chw(flat, h, w, c, dtype=np.int16):
    return np.asarray(flat, dtype).reshape(c, h, w).transpose(1, 2, 0)[None]


class DMCTCMCodec:
    """compress/decompress one P frame against the (ref_frame,
    ref_feature) DPB."""

    def __init__(self, model, params):
        self.model = model
        self.cfg = model.cfg
        self.params = params

        c = self.cfg
        self.gauss = LegacyGaussianTable("laplace")
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
        from ..legacy.dcvc_tcm import DMCTCM, TCM_CONFIG
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or TCM_CONFIG
        model = DMCTCM(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        feat = jnp.zeros((1, 64, 64, cfg.ch_n), dtype)
        init0 = jax.jit(lambda r: model.init({"params": r}, x, x, None))
        init1 = jax.jit(lambda r: model.init({"params": r}, x, x, feat))
        r1, _ = jax.random.split(rng)
        p0 = init0(r1)["params"]
        p1 = init1(r1)["params"]

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
        self.ref_frame = None
        self.ref_feature = None

    def set_ref_frame(self, frame, h=None, w=None):
        frame = jnp.asarray(frame)
        h = frame.shape[1] if h is None else h
        w = frame.shape[2] if w is None else w
        p = self._get_programs(h, w)
        self.clear_dpb()
        self.ref_frame = p["pad_x"](frame)

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
        model = self.model
        variables = {"params": self.params}

        def _apply(method, *args):
            return model.apply(variables, *args, method=method)

        @jax.jit
        def pad_x(x):
            return jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                           mode="edge")

        @jax.jit
        def mv_analysis(x, ref_frame):
            return _apply(type(model).mv_analysis, x, ref_frame)

        @jax.jit
        def mv_prior(mv_z_int):
            scales, means = _apply(type(model).mv_prior, mv_z_int)
            idx = self.gauss.build_indexes(scales).astype(jnp.uint8)
            return means, idx

        @jax.jit
        def mv_quant(mv_y, means):
            return jnp.clip(jnp.round(mv_y - means),
                            -30000, 30000).astype(jnp.int16)

        @jax.jit
        def mv_synthesis(mv_y_q, means):
            mv_y_hat = mv_y_q.astype(jnp.float32) + means
            return mv_y_hat, _apply(type(model).mv_synthesis, mv_y_hat)

        def _mc(has_feature):
            @jax.jit
            def fn(ref_frame, ref_feature, mv_hat):
                return _apply(type(model).mc, ref_frame, ref_feature,
                              has_feature, mv_hat)
            return fn

        @jax.jit
        def ctx_analysis(x, c1, c2, c3):
            return _apply(type(model).ctx_analysis, x, c1, c2, c3)

        @jax.jit
        def ctx_prior(z_int, c1, c2, c3):
            scales, means = _apply(type(model).ctx_prior, z_int, c1, c2, c3)
            idx = self.gauss.build_indexes(scales).astype(jnp.uint8)
            return means, idx

        @jax.jit
        def ctx_quant(y, means):
            return jnp.clip(jnp.round(y - means),
                            -30000, 30000).astype(jnp.int16)

        @jax.jit
        def synthesis(y_q, means, c1, c2, c3):
            y_hat = y_q.astype(jnp.float32) + means
            x_hat, feature = _apply(type(model).synthesis, y_hat,
                                    c1, c2, c3)
            return y_hat, x_hat[:, :h, :w, :], feature

        progs = {
            "pad_x": pad_x,
            "mv_analysis": mv_analysis,
            "mv_prior": mv_prior,
            "mv_quant": mv_quant,
            "mv_synthesis": mv_synthesis,
            "mc": {f: _mc(f) for f in (False, True)},
            "ctx_analysis": ctx_analysis,
            "ctx_prior": ctx_prior,
            "ctx_quant": ctx_quant,
            "synthesis": synthesis,
            "dims": (ph, pw, yh, yw, zh, zw),
        }
        self._programs[key] = progs
        return progs

    # ------------------------------------------------------------ encode

    def compress(self, x, h=None, w=None):
        """x: (1, H, W, 3) RGB f32 [0, 1].  Returns dict(bit_stream,
        x_hat)."""
        assert self.ref_frame is not None, "DPB empty"
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        cfg = self.cfg
        xp = p["pad_x"](x)

        mv_y, mv_z_int = p["mv_analysis"](xp, self.ref_frame)
        mv_means, mv_idx = p["mv_prior"](mv_z_int)
        mv_y_q = p["mv_quant"](mv_y, mv_means)
        mv_y_hat, mv_hat = p["mv_synthesis"](mv_y_q, mv_means)

        has_feature = self.ref_feature is not None
        feat = self.ref_feature if has_feature else self.ref_frame
        c1, c2, c3 = p["mc"][has_feature](self.ref_frame, feat, mv_hat)

        y, z_int = p["ctx_analysis"](xp, c1, c2, c3)
        means, idx = p["ctx_prior"](z_int, c1, c2, c3)
        y_q = p["ctx_quant"](y, means)
        y_hat, x_hat, feature = p["synthesis"](y_q, means, c1, c2, c3)

        self.ref_frame = p["pad_x"](x_hat)
        self.ref_feature = feature

        start_copies(mv_z_int, mv_idx, mv_y_q, z_int, idx, y_q)
        enc = self.encoder
        enc.reset()
        # stream order: z_mv, mv_y, z, y (video_net_dmc.py:321-341)
        enc.encode_with_indexes(
            _to_chw(mv_z_int), build_z_indexes(0, cfg.ch_n, zh, zw),
            self.g_zmv)
        enc.encode_with_indexes(
            _to_chw(mv_y_q), _to_chw(mv_idx).astype(np.int16), self.g_y)
        enc.encode_with_indexes(
            _to_chw(z_int), build_z_indexes(0, cfg.ch_n, zh, zw), self.g_z)
        enc.encode_with_indexes(
            _to_chw(y_q), _to_chw(idx).astype(np.int16), self.g_y)
        enc.flush()
        return {"bit_stream": enc.get_encoded_stream(), "x_hat": x_hat}

    # ------------------------------------------------------------ decode

    def decompress(self, bit_stream, h, w):
        assert self.ref_frame is not None, "DPB empty"
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        cfg = self.cfg
        dec = self.decoder
        dec.set_stream(bit_stream)

        mv_z_np = dec.decode_stream(
            build_z_indexes(0, cfg.ch_n, zh, zw), self.g_zmv)
        mv_z_int = jnp.asarray(_from_chw(mv_z_np, zh, zw, cfg.ch_n))
        mv_means, mv_idx = p["mv_prior"](mv_z_int)
        mv_sym = dec.decode_stream(
            _to_chw(mv_idx).astype(np.int16), self.g_y)
        mv_y_q = jnp.asarray(_from_chw(mv_sym, yh, yw, cfg.ch_mv))
        mv_y_hat, mv_hat = p["mv_synthesis"](mv_y_q, mv_means)

        has_feature = self.ref_feature is not None
        feat = self.ref_feature if has_feature else self.ref_frame
        c1, c2, c3 = p["mc"][has_feature](self.ref_frame, feat, mv_hat)

        z_np = dec.decode_stream(
            build_z_indexes(0, cfg.ch_n, zh, zw), self.g_z)
        z_int = jnp.asarray(_from_chw(z_np, zh, zw, cfg.ch_n))
        means, idx = p["ctx_prior"](z_int, c1, c2, c3)
        sym = dec.decode_stream(_to_chw(idx).astype(np.int16), self.g_y)
        y_q = jnp.asarray(_from_chw(sym, yh, yw, cfg.ch_m))
        y_hat, x_hat, feature = p["synthesis"](y_q, means, c1, c2, c3)

        self.ref_frame = p["pad_x"](x_hat)
        self.ref_feature = feature
        return {"x_hat": x_hat}
