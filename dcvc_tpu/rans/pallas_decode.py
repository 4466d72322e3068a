"""Pallas (Mosaic TPU) rANS decoder — the fast on-device symbol loop.

Same wire format and bit-exact semantics as the host coder (rans.cc,
itself byte-conformant with the reference py_rans: 32-bit state, 16-bit
scale, byte renorm with lower bound 2^23, zig-zag symbols, 2-bit bypass
escapes, contiguous lane splits, pair-merged streams) and as the XLA
decoder in device_decode.py — but the per-symbol loop runs as a Mosaic
scalar/vector loop instead of XLA gather/scatter ops, which cost ~26 us
per symbol step (measured on a v5e; the XLA path loses to the host
coder even across a ~30 ms-RTT tunnel).  Here each step is a handful of
VPU ops over an (n_lanes, width) tile plus a few scalar byte pulls, so
a full decode rung is ~1-5 ms and the codecs' decode ladders
(dmci_proxy.cpp:423-602, dmc_htl_proxy.cpp:606-690 in the reference)
can run with ZERO blocking host round-trips.

Layout per decode call (cap = padded candidate capacity):

  XLA pre:   idx (cap,)  -> idx_lanes (Lc, n_lanes) int32 gather
             streams (n_lanes, L) uint8 -> packed LE int32 words
  kernel:    chunked DMA of idx_lanes rows; per symbol step, all lanes
             advance together (vector compare/reduce CDF search, scalar
             byte pulls); out chunk written back to HBM
  XLA post:  out_lanes (Lc, n_lanes) -> (cap,) gather + count mask

All arithmetic is int32 (rANS state < 2^31 throughout: state in
[2^23, 2^31), freq <= 2^16, so freq*(state>>16) < 2^31), making results
bit-identical across backends and to the host decoder.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_SCALE_BITS = 16
K_RANS_L = 1 << 23
K_DEC_MASK = (1 << K_SCALE_BITS) - 1
K_BYPASS_BITS = 2
K_MAX_BYPASS = (1 << K_BYPASS_BITS) - 1

CHUNK = 512  # symbols per lane per DMA'd idx/out chunk


def _pack_bank(cdf, cdf_lengths):
    """(R, per+2) int32: row = [cdf..., rlen, maxv]."""
    cdf = np.ascontiguousarray(cdf, np.int32)
    lengths = np.asarray(cdf_lengths, np.int32).reshape(-1)
    bank = np.concatenate(
        [cdf, lengths[:, None], (lengths - 2)[:, None]], axis=1)
    return bank


def _pack_streams(streams):
    """(n, L) uint8 -> (n, W2, 128) int32 LE words (jnp, cheap).

    3D layout with the word index split over (sublane, lane) dims:
    Mosaic cannot index the lane dim dynamically, so the byte fetch
    loads an aligned (1, 128) word row and mask-reduces the word out."""
    n, L = streams.shape
    W = -(-L // 4)
    W2 = -(-W // 128)
    pad = W2 * 128 * 4 - L
    if pad:
        streams = jnp.pad(streams, ((0, 0), (0, pad)))
    b = streams.reshape(n, W2 * 128, 4).astype(jnp.int32)
    words = b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16) \
        | (b[:, :, 3] << 24)
    return words.reshape(n, W2, 128)


def _decode_kernel(n_lanes, n_chunks_max, per, chunk,
                   # refs
                   count_ref, streams_ref, bank_ref, st_ref, ptr_ref,
                   idx_hbm, out_hbm, st_out, ptr_out,
                   idx_vmem, out_vmem, rows_vmem, bounce, sem_in, sem_out):
    """One rANS decode pass over all lanes.

    count_ref (1,1) SMEM; streams_ref (n, W) int32 VMEM; bank_ref
    (R, per+2) int32 VMEM; st/ptr (n, 1) int32 VMEM; idx_hbm/out_hbm
    (Lc, n) int32/int32 in ANY/HBM; scratch: idx_vmem/out_vmem
    (chunk, n), rows_vmem (n, per+2), bounce (n, 1)."""
    count = count_ref[0, 0]
    size0 = count // n_lanes
    lane = lax.broadcasted_iota(jnp.int32, (n_lanes, 1), 0)
    sizes = jnp.where(lane == n_lanes - 1,
                      count - size0 * (n_lanes - 1), size0)
    max_size = count - size0 * (n_lanes - 1)
    n_chunks = lax.div(max_size + (chunk - 1), chunk)

    W = streams_ref.shape[1] * 128
    col128 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    colmask = lax.broadcasted_iota(jnp.int32, (n_lanes, per + 2), 1)

    def pull(st, ptr, need):
        """One predicated renorm byte pull per lane (rans.cc:142-144).

        ptr differs per lane (a true gather, no vector load), so the
        vector ptr takes a round trip through VMEM (vector store +
        scalar reads — Mosaic allows scalar VMEM loads, not stores) and
        the bytes come back as scalar loads re-vectorized by per-lane
        iota selects (unaligned vector loads are not lowerable)."""
        bounce[:, :] = ptr
        bytes_v = jnp.zeros((n_lanes, 1), jnp.int32)
        for i in range(n_lanes):
            p = bounce[i, 0]
            wi = jnp.minimum(p >> 2, W - 1)
            wrow = streams_ref[i, pl.ds(wi >> 7, 1), :]      # (1, 128)
            w = jnp.sum(jnp.where(col128 == (wi & 127), wrow, 0),
                        axis=1, keepdims=True)               # (1, 1)
            b = (w >> ((p & 3) * 8)) & 255
            bytes_v = jnp.where(lane == i, b, bytes_v)
        st2 = (st << 8) | bytes_v
        return jnp.where(need, st2, st), jnp.where(need, ptr + 1, ptr)

    def get_bits(st, ptr, active):
        """dec_get_bits (rans.cc:124-131) on active lanes."""
        val = st & K_MAX_BYPASS
        st2 = st >> K_BYPASS_BITS
        st3, ptr3 = pull(st2, ptr, active & (st2 < K_RANS_L))
        st = jnp.where(active, st3, st)
        ptr = jnp.where(active, ptr3, ptr)
        return val, st, ptr

    outcol = lax.broadcasted_iota(jnp.int32, (n_lanes, chunk), 1)

    def sym_step(jj, base, st, ptr, acc):
        j = base + jj
        active = j < sizes                                    # (n, 1)
        # per-lane CDF row loads (dynamic rows: scalar-indexed copies)
        for i in range(n_lanes):
            r = idx_vmem[jj, i]
            rows_vmem[pl.ds(i, 1), :] = bank_ref[pl.ds(r, 1), :]
        crow = rows_vmem[:, :]                                # (n, per+2)
        rlen = crow[:, per:per + 1]
        maxv = crow[:, per + 1:per + 2]
        cum = st & K_DEC_MASK
        le = (crow <= cum) & (colmask >= 1) & (colmask < rlen)
        s = jnp.sum(le.astype(jnp.int32), axis=1, keepdims=True)
        low = jnp.sum(jnp.where(colmask == s, crow, 0), axis=1,
                      keepdims=True)
        high = jnp.sum(jnp.where(colmask == s + 1, crow, 0), axis=1,
                       keepdims=True)
        st2 = (high - low) * (st >> K_SCALE_BITS) + cum - low
        st2, ptr2 = pull(st2, ptr, active & (st2 < K_RANS_L))
        st2, ptr2 = pull(st2, ptr2, active & (st2 < K_RANS_L))

        esc = active & (s == maxv)

        def bypass(args):
            st3, ptr3 = args
            val, st3, ptr3 = get_bits(st3, ptr3, esc)
            n_byp = jnp.where(esc, val, 0)
            # mask carried as int32: Mosaic cannot yield i1 vectors
            # across loop boundaries ("failed to legalize scf.yield")
            more0 = (esc & (val == K_MAX_BYPASS)).astype(jnp.int32)

            def more_count(c2):
                v2, st4, ptr4, nb, more = c2
                m = more != 0
                v2, st4, ptr4 = get_bits(st4, ptr4, m)
                nb = nb + jnp.where(m, v2, 0)
                more = more * (v2 == K_MAX_BYPASS).astype(jnp.int32)
                return v2, st4, ptr4, nb, more

            _, st3, ptr3, n_byp, _ = lax.while_loop(
                lambda c2: jnp.any(c2[4] != 0), more_count,
                (val, st3, ptr3, n_byp, more0))

            def chunks_body(c3):
                k, st4, ptr4, raw = c3
                act = esc & (k < n_byp)
                v3, st4, ptr4 = get_bits(st4, ptr4, act)
                raw = raw | jnp.where(act, v3 << (k * K_BYPASS_BITS), 0)
                return k + 1, st4, ptr4, raw

            k0 = jnp.zeros((), jnp.int32)
            raw0 = jnp.zeros((n_lanes, 1), jnp.int32)
            _, st3, ptr3, raw = lax.while_loop(
                lambda c3: jnp.any(esc & (c3[0] < n_byp)),
                chunks_body, (k0, st3, ptr3, raw0))
            return st3, ptr3, raw

        st2, ptr2, raw = lax.cond(
            jnp.any(esc), bypass,
            lambda args: (args[0], args[1],
                          jnp.zeros((n_lanes, 1), jnp.int32)),
            (st2, ptr2))

        value = jnp.where(esc, raw + maxv, s)
        sym = jnp.where(value % 2 == 1, (value + 1) // 2,
                        -((value + 1) // 2))
        sym = jnp.where(active, sym, 0)
        # accumulate into the carried (n, chunk) register tile (no
        # dynamic-index stores; one vector store per chunk at the end)
        acc = jnp.where(outcol == jj, sym, acc)
        st = jnp.where(active, st2, st)
        ptr = jnp.where(active, ptr2, ptr)
        return st, ptr, acc

    def chunk_body(c, carry):
        st, ptr = carry
        base = pl.multiple_of(c * chunk, chunk)
        cin = pltpu.make_async_copy(
            idx_hbm.at[pl.ds(base, chunk), :], idx_vmem, sem_in)
        cin.start()
        cin.wait()

        def body(jj, carry2):
            st, ptr, acc = carry2
            return sym_step(jj, c * chunk, st, ptr, acc)

        acc0 = jnp.zeros((n_lanes, chunk), jnp.int32)
        st, ptr, acc = lax.fori_loop(0, chunk, body, (st, ptr, acc0))
        out_vmem[:, :] = acc
        cout = pltpu.make_async_copy(
            out_vmem, out_hbm.at[:, pl.ds(base, chunk)], sem_out)
        cout.start()
        cout.wait()
        return st, ptr

    st = st_ref[:, :]
    ptr = ptr_ref[:, :]
    st, ptr = lax.fori_loop(0, n_chunks, chunk_body, (st, ptr))
    st_out[:, :] = st
    ptr_out[:, :] = ptr


def make_decode_fn_pallas(cdf, cdf_lengths, n_lanes, cap, chunk=CHUNK,
                          interpret=False):
    """Pallas drop-in for device_decode.make_decode_fn: build
    decode(state, idx, count) -> (state, symbols int8 (cap,)).

    Same state pytree ({"streams" (n, L) uint8, "st" (n,) uint32,
    "ptr" (n,) int32}) and identical decoded bytes/symbols."""
    bank = _pack_bank(cdf, cdf_lengths)
    per = bank.shape[1] - 2
    bank_j = jnp.asarray(bank)
    Lc = cap // n_lanes + n_lanes
    Lc = -(-Lc // chunk) * chunk
    n_chunks_max = Lc // chunk

    kernel = functools.partial(_decode_kernel, n_lanes, n_chunks_max,
                               per, chunk)

    def decode(state, idx, count):
        streams = state["streams"]
        count = jnp.asarray(count, jnp.int32)
        idx = jnp.asarray(idx).astype(jnp.int32)
        streams32 = _pack_streams(streams)
        st = state["st"].astype(jnp.uint32).view(jnp.int32) \
            .reshape(n_lanes, 1)
        ptr = state["ptr"].reshape(n_lanes, 1)

        # lane dim padded to 128: HBM refs are (1, 128)-tiled and DMA
        # slices must be lane-aligned (Mosaic); surplus columns decode
        # nothing (kernel loops over real lanes only)
        size0 = count // n_lanes
        jj = jnp.arange(Lc, dtype=jnp.int32)[:, None]
        ll = jnp.arange(128, dtype=jnp.int32)[None, :]
        idx_lanes = idx[jnp.clip(size0 * jnp.minimum(ll, n_lanes - 1) + jj,
                                 0, cap - 1)]

        out_lanes, st2, ptr2 = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n_lanes, Lc), jnp.int32),
                jax.ShapeDtypeStruct((n_lanes, 1), jnp.int32),
                jax.ShapeDtypeStruct((n_lanes, 1), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),      # count
                pl.BlockSpec(memory_space=pltpu.VMEM),      # streams32
                pl.BlockSpec(memory_space=pltpu.VMEM),      # bank
                pl.BlockSpec(memory_space=pltpu.VMEM),      # st
                pl.BlockSpec(memory_space=pltpu.VMEM),      # ptr
                pl.BlockSpec(memory_space=pltpu.HBM),       # idx_lanes
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.HBM),    # out_lanes
                pl.BlockSpec(memory_space=pltpu.VMEM),      # st
                pl.BlockSpec(memory_space=pltpu.VMEM),      # ptr
            ),
            scratch_shapes=[
                pltpu.VMEM((chunk, 128), jnp.int32),        # idx chunk
                pltpu.VMEM((n_lanes, chunk), jnp.int32),    # out chunk
                pltpu.VMEM((n_lanes, per + 2), jnp.int32),  # cdf rows
                pltpu.VMEM((n_lanes, 1), jnp.int32),        # bounce
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(count.reshape(1, 1), streams32, bank_j, st, ptr, idx_lanes)

        # gather lane blocks back to packed order, zero past count
        k = jnp.arange(cap, dtype=jnp.int32)
        size0_safe = jnp.maximum(size0, 1)
        lane_of = jnp.where(size0 == 0, n_lanes - 1,
                            jnp.minimum(k // size0_safe, n_lanes - 1))
        j_of = jnp.clip(k - size0 * lane_of, 0, Lc - 1)
        out = out_lanes[lane_of, j_of]
        out = jnp.where(k < count, out, 0).astype(jnp.int8)

        new_state = {"streams": streams,
                     "st": st2.reshape(n_lanes).view(jnp.uint32),
                     "ptr": ptr2.reshape(n_lanes)}
        return new_state, out

    return decode
