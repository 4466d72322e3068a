"""Shard-invariance contract of the spatial-sharding mode (SURVEY §2.5).

DMCICodec(spatial_mesh=...) H-shards the heavy conv transforms
(analysis/synthesis) over the mesh; GSPMD inserts the halo exchanges.

What IS guaranteed (and asserted here):
- every symbol DECISION tensor (counts, positions, CDF indexes) is
  computed by replicated programs identical to the unsharded codec, so
  streams cross-decode bit-exactly in both directions
  (sharded-enc -> unsharded-dec and vice versa);
- the sharded codec's own enc/dec roundtrip is bit-exact (shared
  executables, the runtime's core contract).

What is NOT guaranteed: byte-identical streams vs the unsharded codec.
The sharded conv partitioning changes f32 accumulation tails by ~1 ulp
(measured 3e-7 on CPU GSPMD), which flips occasional ste_round
boundaries, so a handful of SYMBOL VALUES near quant boundaries may
differ.  Both encodings are valid and decode exactly on either codec —
the same property the round-3 dryrun established for the smooth bpp
term, extended here to the real compress/decompress path (verdict
item 10).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dcvc_tpu.models.dmci import TINY_CONFIG
from dcvc_tpu.runtime.image_codec import DMCICodec


@pytest.fixture(scope="module")
def codecs():
    base = DMCICodec.init_random(jax.random.PRNGKey(0), cfg=TINY_CONFIG,
                                 dtype=jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sharded = DMCICodec(base.params, cfg=TINY_CONFIG, dtype=jnp.float32,
                        spatial_mesh=mesh)
    return base, sharded


def _img(seed, h=128, w=64):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-0.5, 0.5, (1, h, w, 3))
                       .astype(np.float32))


def test_sharded_roundtrip_bit_exact(codecs):
    """Sharded enc -> sharded dec must reproduce the encoder's recon
    EXACTLY (shared-executable contract under sharding)."""
    _, sharded = codecs
    x = _img(11)
    for qp in (0, 5):
        enc = sharded.compress(x, qp)
        out = sharded.decompress(enc["bit_stream"], qp, 128, 64,
                                 enc["ec_parallel"])
        assert np.array_equal(np.asarray(out["x_hat"]),
                              np.asarray(enc["x_hat"])), f"qp {qp}"


def test_cross_decode_both_directions(codecs):
    """Streams must decode across codecs: the decision programs are
    replicated and identical, so entropy decode consumes either stream
    exactly; only the f32 synthesis output may differ at ulp level."""
    base, sharded = codecs
    x = _img(12)

    enc_b = base.compress(x, 3)
    out_s = sharded.decompress(enc_b["bit_stream"], 3, 128, 64,
                               enc_b["ec_parallel"])
    np.testing.assert_allclose(np.asarray(out_s["x_hat"]),
                               np.asarray(enc_b["x_hat"]),
                               rtol=1e-4, atol=1e-4)

    enc_s = sharded.compress(x, 3)
    out_b = base.decompress(enc_s["bit_stream"], 3, 128, 64,
                            enc_s["ec_parallel"])
    np.testing.assert_allclose(np.asarray(out_b["x_hat"]),
                               np.asarray(enc_s["x_hat"]),
                               rtol=1e-4, atol=1e-4)


def test_symbol_decisions_shard_invariant(codecs):
    """The decision path itself (counts + CDF indexes from prior0 on the
    SAME z) must be bit-identical between codecs — this is the invariant
    that makes cross-decode exact."""
    base, sharded = codecs
    x = _img(13)
    pa = base._get_programs(128, 64)
    pb = sharded._get_programs(128, 64)
    _, z = pa["analysis"](x, jnp.int32(2))
    out_a = pa["prior0"](z)
    out_b = pb["prior0"](z)
    # means, ctx, packed_idx, packed_pos, count, cond
    for ta, tb in zip(out_a, out_b):
        assert np.array_equal(np.asarray(ta), np.asarray(tb))
