"""EVC image-codec bitstream runtime (dual cross-checkerboard prior).

Reference: DCVC-family/EVC/src/models/image_model.py:131-200.  Single
stream: z, y part 0, y part 1; gaussian scale table; dense checkerboard
write grids = the UF 2x phase terms.  Shared enc/dec stage programs.
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


class EVCCodec:
    def __init__(self, model, params):
        self.model = model
        self.cfg = model.cfg
        self.params = params

        self.gauss = LegacyGaussianTable("gaussian")  # image_model.py:18
        y_cdf, y_len, y_off = self.gauss.compute_cdf_bank()
        z_cdf, z_len, z_off = legacy_bitparm_bank(
            params["bit_estimator_z"], 1, self.cfg.n)
        self.encoder = rans.IndexedRansEncoder()
        self.decoder = rans.IndexedRansDecoder()
        for coder in (self.encoder, self.decoder):
            gy = coder.add_cdf(y_cdf, y_len, y_off)
            gz = coder.add_cdf(z_cdf, z_len, z_off)
        self.g_y, self.g_z = gy, gz
        self._programs = {}

    @classmethod
    def init_random(cls, rng=None, cfg=None, dtype=jnp.float32,
                    init_scale=1.0):
        from ..legacy.evc import EVC, EVC_CONFIG
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or EVC_CONFIG
        model = EVC(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        init = jax.jit(lambda r: model.init({"params": r}, x))
        params = init(rng)["params"]
        if init_scale != 1.0:
            def scale_kernels(path, leaf):
                if path[-1].key == "kernel":
                    return leaf * init_scale
                return leaf
            params = jax.tree_util.tree_map_with_path(scale_kernels, params)
        return cls(model, params)

    def _get_programs(self, h, w):
        key = (h, w)
        if key in self._programs:
            return self._programs[key]

        cfg = self.cfg
        pad_r, pad_b = get_padding_size(h, w, 64)
        ph, pw = h + pad_b, w + pad_r
        yh, yw = ph // 16, pw // 16
        zh, zw = ph // 64, pw // 64
        terms = phase_terms_2x(cfg.n)
        model = self.model
        variables = {"params": self.params}

        def _apply(method, *args):
            return model.apply(variables, *args, method=method)

        @jax.jit
        def analysis(x, qs):
            xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                         mode="edge")
            return _apply(type(model).analysis, xp, qs)

        @jax.jit
        def prior(z_int):
            q_step, scales, means = _apply(type(model).prior, z_int)
            idx0 = self.gauss.build_indexes(
                phase_split(scales, terms[0]).astype(jnp.float32)) \
                .astype(jnp.uint8)
            return q_step, scales, means, idx0

        def _enc_quant(step):
            @jax.jit
            def fn(y, q_step, means):
                y_c = phase_split(y / q_step.astype(jnp.float32),
                                  terms[step])
                m_c = phase_split(means, terms[step]).astype(jnp.float32)
                return jnp.clip(jnp.round(y_c - m_c),
                                -30000, 30000).astype(jnp.int16)
            return fn

        @jax.jit
        def step0(y_q_c, q_step, scales, means):
            m_c = phase_split(means, terms[0]).astype(jnp.float32)
            y_hat0 = phase_merge(y_q_c.astype(jnp.float32) + m_c,
                                 terms[0], cfg.n)
            scales1, means1 = _apply(type(model).spatial, y_hat0, q_step,
                                     scales, means)
            idx1 = self.gauss.build_indexes(
                phase_split(scales1, terms[1]).astype(jnp.float32)) \
                .astype(jnp.uint8)
            return y_hat0, means1, idx1

        @jax.jit
        def step1(y_q_c, means1, y_hat0, q_step):
            m_c = phase_split(means1, terms[1]).astype(jnp.float32)
            y_hat1 = phase_merge(y_q_c.astype(jnp.float32) + m_c,
                                 terms[1], cfg.n)
            return (y_hat0 + y_hat1) * q_step.astype(jnp.float32)

        @jax.jit
        def synthesis(y_hat_acc, qs):
            x_hat = _apply(type(model).synthesis, y_hat_acc, qs)
            return x_hat[:, :h, :w, :]

        progs = {
            "analysis": analysis,
            "prior": prior,
            "enc_quant": [_enc_quant(k) for k in range(2)],
            "step0": step0,
            "step1": step1,
            "synthesis": synthesis,
            "dims": (ph, pw, yh, yw, zh, zw),
            "terms": terms,
        }
        self._programs[key] = progs
        return progs

    def compress(self, x, q_scale, h=None, w=None):
        """x: (1, H, W, 3) RGB f32 [0, 1].  Returns dict(bit_stream,
        x_hat)."""
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        qs = jnp.float32(q_scale)

        y, z_int = p["analysis"](x, qs)
        start_copies(z_int)
        q_step, scales, means, idx0 = p["prior"](z_int)
        y_q0 = p["enc_quant"][0](y, q_step, means)
        y_hat0, means1, idx1 = p["step0"](y_q0, q_step, scales, means)
        y_q1 = p["enc_quant"][1](y, q_step, means1)
        y_hat_acc = p["step1"](y_q1, means1, y_hat0, q_step)
        x_hat = p["synthesis"](y_hat_acc, qs)

        start_copies(idx0, y_q0, idx1, y_q1)
        enc = self.encoder
        enc.reset()
        enc.encode_with_indexes(
            np.asarray(z_int)[0].transpose(2, 0, 1).reshape(-1),
            build_z_indexes(0, self.cfg.n, zh, zw), self.g_z)
        for y_q, idx, k in ((y_q0, idx0, 0), (y_q1, idx1, 1)):
            enc.encode_with_indexes(
                cand_to_chw(np.asarray(y_q), p["terms"][k]),
                cand_to_chw(np.asarray(idx), p["terms"][k])
                .astype(np.int16), self.g_y)
        enc.flush()
        return {"bit_stream": enc.get_encoded_stream(), "x_hat": x_hat}

    def decompress(self, bit_stream, q_scale, h, w):
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        qs = jnp.float32(q_scale)
        dec = self.decoder
        dec.set_stream(bit_stream)

        z_np = dec.decode_stream(
            build_z_indexes(0, self.cfg.n, zh, zw), self.g_z)
        z_int = jnp.asarray(z_np.reshape(self.cfg.n, zh, zw)
                            .transpose(1, 2, 0)[None])
        q_step, scales, means, idx0 = p["prior"](z_int)

        def dec_part(idx, k):
            ind = cand_to_chw(np.asarray(idx), p["terms"][k]) \
                .astype(np.int16)
            sym = dec.decode_stream(ind, self.g_y)
            return jnp.asarray(chw_to_cand(sym, p["terms"][k], yh // 2,
                                           yw // 2)
                               .reshape(1, yh // 2, yw // 2, 2 * self.cfg.n))

        y_q0 = dec_part(idx0, 0)
        y_hat0, means1, idx1 = p["step0"](y_q0, q_step, scales, means)
        y_q1 = dec_part(idx1, 1)
        y_hat_acc = p["step1"](y_q1, means1, y_hat0, q_step)
        x_hat = p["synthesis"](y_hat_acc, qs)
        return {"x_hat": x_hat}


class IntraNoARCodec(EVCCodec):
    """The HEM/DC/FM family intra codec (IntraNoAR,
    DCVC-HEM/src/models/image_model.py:15-200) under the same dual-
    checkerboard runtime machinery; its recon seeds the P-codecs' DPBs
    (set_ref_frame)."""

    @classmethod
    def init_random(cls, rng=None, cfg=None, dtype=jnp.float32,
                    init_scale=1.0):
        from ..legacy.hem_intra import IntraNoAR, INTRA_NOAR_CONFIG
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or INTRA_NOAR_CONFIG
        model = IntraNoAR(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        init = jax.jit(lambda r: model.init({"params": r}, x))
        params = init(rng)["params"]
        if init_scale != 1.0:
            def scale_kernels(path, leaf):
                if path[-1].key == "kernel":
                    return leaf * init_scale
                return leaf
            params = jax.tree_util.tree_map_with_path(scale_kernels, params)
        return cls(model, params)
