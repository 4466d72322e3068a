"""Bitstream runtimes for the vendored CompressAI I-frame codecs
(cheng2020-anchor / bmshj2018-hyperprior) — the DCVC/TCM baseline intra
path (reference DCVC-family/DCVC/src/models/priors.py:327-418,546-680;
src/zoo/image.py:27-33).

Design split (the repo's standard legacy architecture):
  * all CNN transforms (g_a, h_a, h_s, g_s) are shared enc/dec jitted
    device programs — integer latents (y_hat, z_hat) cross the program
    boundary, so encoder and decoder derive bit-identical priors;
  * entropy coding runs on the host through the indexed rANS backend
    (rans.IndexedRansEncoder/Decoder), dense CHW symbol order matching
    the reference's flatten (entropy_models.py:89-121);
  * cheng2020's joint AR context model runs as the serial HostAR loop
    (the reference's own documented slow path, priors.py:546-552).

Streams are the reference's two-string format {y_string, z_string} and
wrap into the per-frame `encode_i` container
(bitstream/legacy_container.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..core.padding import get_padding_size
from ..entropy.compressai import (build_indexes, compressai_gaussian_bank,
                                  compressai_scale_table, eb_bank,
                                  eb_init_params)
from ..legacy.compressai_zoo import (Cheng2020Anchor, Cheng2020Config,
                                     HyperpriorConfig, ScaleHyperprior)
from .. import rans
from .dcvc_codec import HostAR


def _chw(x):
    """NHWC device array -> flat CHW numpy (the reference flatten)."""
    return np.asarray(x)[0].transpose(2, 0, 1).reshape(-1)


def _nhwc(flat, h, w, c):
    return jnp.asarray(flat.reshape(c, h, w).transpose(1, 2, 0)[None])


class _CompressAIBase:
    """Shared z-path (EntropyBottleneck) + gaussian bank plumbing."""

    def __init__(self, model, params, eb_params):
        self.model = model
        self.cfg = model.cfg
        self.params = params
        self.eb_params = eb_params

        z_cdf, z_len, z_off, self.z_medians = eb_bank(eb_params)
        self.scale_table = compressai_scale_table()
        y_cdf, y_len, y_off = compressai_gaussian_bank(self.scale_table)

        self.encoder = rans.IndexedRansEncoder()
        self.decoder = rans.IndexedRansDecoder()
        for coder in (self.encoder, self.decoder):
            gy = coder.add_cdf(y_cdf, y_len, y_off)
            gz = coder.add_cdf(z_cdf, z_len, z_off)
        self.g_y, self.g_z = gy, gz
        self._programs = {}

    def _apply(self, method, *args):
        return self.model.apply({"params": self.params}, *args,
                                method=method)

    def _encode_z(self, z):
        """EntropyBottleneck.compress (entropy_models.py:377-381):
        symbols = round(z - medians) per channel, channel-id indexes.
        Returns (z_string, z_hat device array)."""
        zc = np.asarray(z)[0].transpose(2, 0, 1)      # (C, zh, zw)
        c, zh, zw = zc.shape
        med = self.z_medians[:, None, None]
        symbols = np.round(zc - med).astype(np.int16)
        idx = np.repeat(np.arange(c, dtype=np.int16), zh * zw)
        self.encoder.reset()
        self.encoder.encode_with_indexes(symbols.reshape(-1), idx, self.g_z)
        self.encoder.flush()
        z_hat = jnp.asarray((symbols.astype(np.float32) + med)
                            .transpose(1, 2, 0)[None])
        return self.encoder.get_encoded_stream(), z_hat

    def _decode_z(self, z_string, zh, zw):
        c = self.z_medians.shape[0]
        idx = np.repeat(np.arange(c, dtype=np.int16), zh * zw)
        self.decoder.set_stream(z_string)
        symbols = self.decoder.decode_stream(idx, self.g_z)
        med = self.z_medians[:, None, None]
        z_hat = symbols.reshape(c, zh, zw).astype(np.float32) + med
        return jnp.asarray(z_hat.transpose(1, 2, 0)[None])


class HyperpriorCodec(_CompressAIBase):
    """bmshj2018-hyperprior runtime (priors.py:327-349): scales-only
    dense gaussian coding of y, factorized z."""

    @classmethod
    def init_random(cls, rng=None, cfg=None, dtype=jnp.float32):
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or HyperpriorConfig()
        model = ScaleHyperprior(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        init_fn = jax.jit(lambda r: model.init(r, x))
        params = jax.tree.map(np.asarray, init_fn(rng)["params"])
        eb = eb_init_params(cfg.N)
        return cls(model, params, eb)

    def _get_programs(self, h, w):
        key = (h, w)
        if key in self._programs:
            return self._programs[key]
        pad_r, pad_b = get_padding_size(h, w, 64)
        ph, pw = h + pad_b, w + pad_r
        m = self.model

        @jax.jit
        def analysis(x):
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                        mode="edge").astype(m.dtype)
            y = self._apply(type(m).g_a, x)
            z = self._apply(type(m).h_a, y)
            return jnp.round(y.astype(jnp.float32)), z.astype(jnp.float32)

        @jax.jit
        def scales_of(z_hat):
            s = self._apply(type(m).h_s, z_hat.astype(m.dtype))
            return s.astype(jnp.float32)

        @jax.jit
        def synthesis(y_hat):
            x_hat = self._apply(type(m).g_s, y_hat.astype(m.dtype))
            x_hat = jnp.clip(x_hat.astype(jnp.float32), 0.0, 1.0)
            return x_hat[:, :h, :w, :]

        progs = {"analysis": analysis, "scales_of": scales_of,
                 "synthesis": synthesis,
                 "dims": (ph, pw, ph // 16, pw // 16, ph // 64, pw // 64)}
        self._programs[key] = progs
        return progs

    def compress(self, x, h=None, w=None):
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        y_round, z = p["analysis"](x)
        z_string, z_hat = self._encode_z(z)
        scales = p["scales_of"](z_hat)
        idx = build_indexes(_chw(scales).reshape(-1),
                            self.scale_table).astype(np.int16)
        symbols = _chw(y_round).astype(np.int16)
        self.encoder.reset()
        self.encoder.encode_with_indexes(symbols, idx, self.g_y)
        self.encoder.flush()
        y_string = self.encoder.get_encoded_stream()
        x_hat = p["synthesis"](y_round)
        return {"y_string": y_string, "z_string": z_string, "x_hat": x_hat}

    def decompress(self, y_string, z_string, h, w):
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        z_hat = self._decode_z(z_string, zh, zw)
        scales = p["scales_of"](z_hat)
        idx = build_indexes(_chw(scales).reshape(-1),
                            self.scale_table).astype(np.int16)
        self.decoder.set_stream(y_string)
        symbols = self.decoder.decode_stream(idx, self.g_y)
        y_hat = _nhwc(symbols.astype(np.float32), yh, yw, self.cfg.M)
        return {"x_hat": p["synthesis"](y_hat)}


class Cheng2020Codec(_CompressAIBase):
    """cheng2020-anchor runtime (priors.py:546-680): factorized z +
    serial masked-conv AR gaussian coding of y (host slow path)."""

    def __init__(self, model, params, eb_params):
        super().__init__(model, params, eb_params)
        ep = {f"layers_{i * 2}": {
            "kernel": params[f"ep_layers_{i}"]["kernel"],
            "bias": params[f"ep_layers_{i}"]["bias"]} for i in range(3)}
        adapter = {"ar": {"kernel": params["context_prediction_kernel"],
                          "bias": params["context_prediction_bias"]},
                   "ep": ep}
        self.ar = HostAR(adapter, "ar", "ep", scales_first=True)

    @classmethod
    def init_random(cls, rng=None, cfg=None, dtype=jnp.float32):
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or Cheng2020Config()
        model = Cheng2020Anchor(cfg=cfg, dtype=dtype)
        x = jnp.zeros((1, 64, 64, 3), dtype)
        init_fn = jax.jit(lambda r: model.init(r, x))
        params = jax.tree.map(np.asarray, init_fn(rng)["params"])
        eb = eb_init_params(cfg.N)
        return cls(model, params, eb)

    def _get_programs(self, h, w):
        key = (h, w)
        if key in self._programs:
            return self._programs[key]
        pad_r, pad_b = get_padding_size(h, w, 64)
        ph, pw = h + pad_b, w + pad_r
        m = self.model

        @jax.jit
        def analysis(x):
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                        mode="edge").astype(m.dtype)
            y = self._apply(type(m).g_a, x)
            z = self._apply(type(m).h_a, y)
            return y.astype(jnp.float32), z.astype(jnp.float32)

        @jax.jit
        def params_of(z_hat):
            s = self._apply(type(m).h_s, z_hat.astype(m.dtype))
            return s.astype(jnp.float32)

        @jax.jit
        def synthesis(y_hat):
            x_hat = self._apply(type(m).g_s, y_hat.astype(m.dtype))
            x_hat = jnp.clip(x_hat.astype(jnp.float32), 0.0, 1.0)
            return x_hat[:, :h, :w, :]

        progs = {"analysis": analysis, "params_of": params_of,
                 "synthesis": synthesis,
                 "dims": (ph, pw, ph // 16, pw // 16, ph // 64, pw // 64)}
        self._programs[key] = progs
        return progs

    def compress(self, x, h=None, w=None):
        x = jnp.asarray(x)
        h = x.shape[1] if h is None else h
        w = x.shape[2] if w is None else w
        p = self._get_programs(h, w)
        y, z = p["analysis"](x)
        z_string, z_hat = self._encode_z(z)
        prior = p["params_of"](z_hat)

        y_q, scales, y_hat = self.ar.encode(np.asarray(y)[0],
                                            np.asarray(prior)[0])
        idx = build_indexes(scales, self.scale_table).astype(np.int16)
        self.encoder.reset()
        # reference symbol order: raster scan, channel-minor
        # (priors.py:595-609 extends per-position channel vectors)
        self.encoder.encode_with_indexes(y_q.reshape(-1), idx.reshape(-1),
                                         self.g_y)
        self.encoder.flush()
        y_string = self.encoder.get_encoded_stream()
        x_hat = p["synthesis"](jnp.asarray(y_hat[None]))
        return {"y_string": y_string, "z_string": z_string, "x_hat": x_hat}

    def decompress(self, y_string, z_string, h, w):
        p = self._get_programs(h, w)
        ph, pw, yh, yw, zh, zw = p["dims"]
        z_hat = self._decode_z(z_string, zh, zw)
        prior = p["params_of"](z_hat)

        self.decoder.set_stream(y_string)

        def decode_vec(sc):
            idx = build_indexes(sc, self.scale_table).astype(np.int16)
            return self.decoder.decode_stream(idx, self.g_y)

        y_hat = self.ar.decode(np.asarray(prior)[0], decode_vec)
        return {"x_hat": p["synthesis"](jnp.asarray(y_hat[None]))}
