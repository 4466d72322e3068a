"""DCVC (NeurIPS'21 baseline) bitstream runtime with serial AR coding.

Reference: DCVC-family/DCVC/src/models/DCVC_net.py:257-414.  The model's
entropy model is a PixelCNN-style masked-conv autoregression: each
latent position's gaussian params depend on already-decoded neighbors,
so decoding is inherently SERIAL.  Design split:

  * all CNN stages (flow, encoders, priors, MC, synthesis) run as
    shared enc/dec device programs;
  * the AR loop runs on the HOST in float32 numpy (HostAR) — the
    documented slow path, exactly the structure of the reference's
    per-position loop (DCVC_net.py:257-330).  Encoder and decoder run
    the SAME host code on the same inputs, so round-trips are bit-exact.

Streams: 4 independent rANS strings (mv_z, mv_y, z, y), matching the
reference's compress result dict (DCVC_net.py:372-385); symbol order is
the reference's channel-last (h, w, c) flatten.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..core.padding import get_padding_size
from ..entropy.legacy import (LegacyGaussianTable, legacy_bitparm_bank,
                              build_z_indexes)
from .. import rans


def _lrelu(x, slope=0.01):
    return np.where(x >= 0, x, slope * x)


class HostAR:
    """Serial masked-conv AR over one latent plane (host, float32).

    Mirrors DCVC_net.compress_ar/decompress_ar: per position, a type-A
    5x5 masked conv over the padded y_hat window feeds the 1x1
    entropy-parameter chain together with the (temporal+hyper) prior
    params; means/scales follow."""

    def __init__(self, params, ar_scope, ep_scope, scales_first=False):
        """scales_first: the cheng2020 prior emits (scales, means) halves
        (priors.py:501 chunk order) where DCVC emits (means, scales)."""
        ar = params[ar_scope]
        k = np.asarray(ar["kernel"], np.float32)        # (5, 5, C, 2C)
        mask = np.ones(k.shape[:2] + (1, 1), np.float32)
        mask[k.shape[0] // 2, k.shape[1] // 2:] = 0
        mask[k.shape[0] // 2 + 1:] = 0
        self.kernel = k * mask
        self.bias = np.asarray(ar["bias"], np.float32)
        ep = params[ep_scope]
        self.ep = [(np.asarray(ep[f"layers_{i}"]["kernel"], np.float32)
                    .reshape(ep[f"layers_{i}"]["kernel"].shape[-2:]),
                    np.asarray(ep[f"layers_{i}"]["bias"], np.float32))
                   for i in (0, 2, 4)]
        self.ksize = k.shape[0]
        self.scales_first = scales_first

    def _params_at(self, window, prior_vec):
        """window: (5, 5, C) padded y_hat crop; prior_vec: (Cp,)."""
        ctx = np.einsum("ijc,ijcd->d", window, self.kernel) + self.bias
        v = np.concatenate([prior_vec, ctx])
        for i, (w, b) in enumerate(self.ep):
            v = v @ w + b
            if i < 2:
                v = _lrelu(v)
        c = v.shape[0] // 2
        if self.scales_first:
            return v[c:], v[:c]  # means, scales
        return v[:c], v[c:]  # means, scales

    def encode(self, y, prior):
        """y, prior: (H, W, C*) f32.  Returns (y_q int16 (H,W,C),
        scales (H,W,C), y_hat (H,W,C))."""
        hh, ww, cc = y.shape
        pad = self.ksize // 2
        y_hat = np.zeros((hh + 2 * pad, ww + 2 * pad, cc), np.float32)
        y_q = np.zeros((hh, ww, cc), np.int16)
        scales = np.zeros((hh, ww, cc), np.float32)
        for h in range(hh):
            for w in range(ww):
                means, sc = self._params_at(
                    y_hat[h:h + self.ksize, w:w + self.ksize], prior[h, w])
                q = np.round(y[h, w] - means).astype(np.float32)
                y_hat[h + pad, w + pad] = q + means
                y_q[h, w] = np.clip(q, -30000, 30000).astype(np.int16)
                scales[h, w] = sc
        return y_q, scales, y_hat[pad:pad + hh, pad:pad + ww]

    def decode(self, prior, decode_vec):
        """decode_vec(scales (C,)) -> decoded residual ints (C,)."""
        hh, ww = prior.shape[:2]
        cc = self.bias.shape[0] // 2
        pad = self.ksize // 2
        y_hat = np.zeros((hh + 2 * pad, ww + 2 * pad, cc), np.float32)
        for h in range(hh):
            for w in range(ww):
                means, sc = self._params_at(
                    y_hat[h:h + self.ksize, w:w + self.ksize], prior[h, w])
                q = decode_vec(sc).astype(np.float32)
                y_hat[h + pad, w + pad] = q + means
        return y_hat[pad:pad + hh, pad:pad + ww]


class DCVCCodec:
    """compress/decompress one P frame against the previous recon."""

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

        self.ar_y = HostAR(params, "auto_regressive", "entropy_parameters")
        self.ar_mv = HostAR(params, "auto_regressive_mv",
                            "entropy_parameters_mv")
        self._programs = {}
        self.ref_frame = None

    @classmethod
    def init_random(cls, rng=None, cfg=None, dtype=jnp.float32,
                    init_scale=1.0):
        from ..legacy.dcvc_net import DCVCNet, DCVC_CONFIG
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or DCVC_CONFIG
        model = DCVCNet(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        init = jax.jit(lambda r: model.init({"params": r}, x, x))
        params = init(rng)["params"]
        if init_scale != 1.0:
            def scale_kernels(path, leaf):
                if path[-1].key == "kernel":
                    return leaf * init_scale
                return leaf
            params = jax.tree_util.tree_map_with_path(scale_kernels, params)
        params = jax.tree.map(np.asarray, params)
        return cls(model, params)

    def set_ref_frame(self, frame, h=None, w=None):
        frame = jnp.asarray(frame)
        h = frame.shape[1] if h is None else h
        w = frame.shape[2] if w is None else w
        p = self._get_programs(h, w)
        self.ref_frame = p["pad_x"](frame)

    def _get_programs(self, h, w):
        key = (h, w)
        if key in self._programs:
            return self._programs[key]

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

        progs = {
            "pad_x": pad_x,
            "mv_analysis": jax.jit(lambda x, r: _apply(
                type(model).mv_analysis, x, r)),
            "mv_prior": jax.jit(lambda z: _apply(type(model).mv_prior, z)),
            "mv_synthesis": jax.jit(lambda y, r: _apply(
                type(model).mv_synthesis, y, r)),
            "ctx_analysis": jax.jit(lambda x, c: _apply(
                type(model).ctx_analysis, x, c)),
            "ctx_prior": jax.jit(lambda z: _apply(type(model).ctx_prior, z)),
            "synthesis": jax.jit(lambda y, c: (
                _apply(type(model).synthesis, y, c)[:, :h, :w, :])),
            "dims": (ph, pw, yh, yw, zh, zw),
        }
        self._programs[key] = progs
        return progs

    def _encode_plane(self, enc, ar, y, prior):
        y_q, scales, y_hat = ar.encode(np.asarray(y)[0],
                                       np.asarray(prior)[0])
        idx = self.gauss.build_indexes_np(scales).astype(np.int16)
        enc.reset()
        enc.encode_with_indexes(y_q.reshape(-1), idx.reshape(-1), self.g_y)
        enc.flush()
        return enc.get_encoded_stream(), y_hat

    def _encode_z(self, enc, z_int, ch, zh, zw, group):
        enc.reset()
        enc.encode_with_indexes(
            np.asarray(z_int)[0].transpose(2, 0, 1).reshape(-1),
            build_z_indexes(0, ch, zh, zw), group)
        enc.flush()
        return enc.get_encoded_stream()

    # ------------------------------------------------------------ encode

    def compress(self, x, h=None, w=None):
        """x: (1, H, W, 3) RGB f32 [0, 1].  Returns dict with the four
        strings (mv_z, mv_y, z, y) + x_hat, like the reference compress
        (DCVC_net.py:372-385)."""
        assert self.ref_frame is not None, "DPB empty"
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        cfg = self.cfg
        xp = p["pad_x"](x)

        mv_y, mv_z_int = p["mv_analysis"](xp, self.ref_frame)
        params_mv = p["mv_prior"](mv_z_int)
        mv_z_str = self._encode_z(self.encoder, mv_z_int, cfg.ch_n, zh, zw,
                                  self.g_zmv)
        mv_y_str, mv_y_hat = self._encode_plane(self.encoder, self.ar_mv,
                                                mv_y, params_mv)
        mv_y_hat = jnp.asarray(mv_y_hat[None])

        context, temporal = p["mv_synthesis"](mv_y_hat, self.ref_frame)
        y, z_int = p["ctx_analysis"](xp, context)
        params = p["ctx_prior"](z_int)
        z_str = self._encode_z(self.encoder, z_int, cfg.ch_n, zh, zw,
                               self.g_z)
        prior_full = jnp.concatenate([temporal, params], axis=-1)
        y_str, y_hat = self._encode_plane(self.encoder, self.ar_y, y,
                                          prior_full)
        y_hat = jnp.asarray(y_hat[None])
        x_hat = p["synthesis"](y_hat, context)

        self.ref_frame = p["pad_x"](x_hat)
        return {"mv_z_string": mv_z_str, "mv_y_string": mv_y_str,
                "z_string": z_str, "y_string": y_str, "x_hat": x_hat}

    # ------------------------------------------------------------ decode

    def decompress(self, mv_y_string, mv_z_string, y_string, z_string,
                   h, w):
        assert self.ref_frame is not None, "DPB empty"
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        cfg = self.cfg
        dec = self.decoder

        dec.set_stream(mv_z_string)
        mv_z_np = dec.decode_stream(
            build_z_indexes(0, cfg.ch_n, zh, zw), self.g_zmv)
        mv_z_int = jnp.asarray(mv_z_np.reshape(cfg.ch_n, zh, zw)
                               .transpose(1, 2, 0)[None])
        params_mv = p["mv_prior"](mv_z_int)

        dec.set_stream(mv_y_string)
        g_y = self.g_y

        def make_decode(d):
            def decode_vec(sc):
                idx = self.gauss.build_indexes_np(sc).astype(np.int16)
                return d.decode_stream(idx, g_y)
            return decode_vec

        mv_y_hat = self.ar_mv.decode(np.asarray(params_mv)[0],
                                     make_decode(dec))
        mv_y_hat = jnp.asarray(mv_y_hat[None])

        context, temporal = p["mv_synthesis"](mv_y_hat, self.ref_frame)
        dec.set_stream(z_string)
        z_np = dec.decode_stream(
            build_z_indexes(0, cfg.ch_n, zh, zw), self.g_z)
        z_int = jnp.asarray(z_np.reshape(cfg.ch_n, zh, zw)
                            .transpose(1, 2, 0)[None])
        params = p["ctx_prior"](z_int)
        prior_full = jnp.concatenate([temporal, params], axis=-1)

        dec.set_stream(y_string)
        y_hat = self.ar_y.decode(np.asarray(prior_full)[0],
                                 make_decode(dec))
        y_hat = jnp.asarray(y_hat[None])
        x_hat = p["synthesis"](y_hat, context)
        self.ref_frame = p["pad_x"](x_hat)
        return {"x_hat": x_hat}
