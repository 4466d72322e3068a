"""DCVC-DC bitstream inference runtime.

Reference: DCVC-family/DCVC-DC/src/models/video_model.py:425-520.  Same
two-stream four-part structure as DCVC-FM (the quadtree write grids,
stream order and payload layout are identical — common_model.py:142-225),
so this subclasses the FM runtime; differences are the CDF banks
(single-qp bitparm rows, z channels = ch_n / ch_16x) and the q ladder
(4 enc/dec anchor scalars x 64-level fine interpolation, traced).

The caller maps frame_idx -> fa_idx via INDEX_MAP[frame_idx % 4]
(the [0, 1, 0, 2] feature-adaptor refresh schedule,
video_model.py motion_compensation).
"""

import jax
import jax.numpy as jnp

from .fm_codec import DMCFMCodec


class DMCDCCodec(DMCFMCodec):
    Z_QP_NUM = 1

    def _z_channels(self):
        return self.cfg.ch_n, self.cfg.ch_16x

    @classmethod
    def init_random(cls, rng=None, cfg=None, dtype=jnp.float32,
                    init_scale=1.0):
        from ..legacy.dcvc_dc import DMCDC, DC_CONFIG
        rng = jax.random.PRNGKey(0) if rng is None else rng
        cfg = cfg or DC_CONFIG
        model = DMCDC(cfg=cfg, dtype=dtype)
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
            out = dict(a)
            for k, v in b.items():
                if k not in out:
                    out[k] = v
                elif hasattr(v, "items"):
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
