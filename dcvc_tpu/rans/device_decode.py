"""On-device (XLA) rANS decoder.

Byte-for-byte the same wire format as the host coder (rans.cc, itself
stream-compatible with the reference py_rans: 32-bit state, 16-bit
scale, byte renormalization with lower bound 2^23, zig-zag symbols,
2-bit bypass escapes, contiguous equal lane splits with the last lane
taking the remainder) — but the symbol loop runs INSIDE jit as integer
XLA ops, so a multi-rung decode ladder needs zero host round-trips:
the host enqueues prior -> decode -> step -> decode -> ... -> recon
asynchronously and blocks only on the final frame fetch.

This is the TPU-native answer to the reference's decode overlap
(dmci_proxy.cpp:423-602, dmc_htl_proxy.cpp:606-690): where the CUDA
runtime hides a ~microsecond host hop behind stream work, a tunneled
or networked TPU pays ~30 ms per hop — so the hop is removed entirely
instead of hidden.  Integer rANS arithmetic is exact on every backend,
so the decoded symbols are bit-identical to the host coder's.

Host-side helpers mirror rans.cc dcvc_rans_decoder_set_stream (pair
merge parsing / odd-lane byte reversal); the device loop mirrors
dec_symbol / dec_get_bits (rans.cc:124-161).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

K_SCALE_BITS = 16
K_RANS_L = np.uint32(1 << 23)
K_DEC_MASK = np.uint32((1 << K_SCALE_BITS) - 1)
K_BYPASS_BITS = 2
K_MAX_BYPASS = np.uint32((1 << K_BYPASS_BITS) - 1)


# --------------------------------------------------------------- host side

def split_streams(stream, n_lanes, pad_to=None):
    """Split the merged wire stream into per-lane byte arrays (reversed
    for odd lanes), mirroring dcvc_rans_decoder_set_stream.

    Returns (lanes (n_lanes, L) uint8, lengths (n_lanes,) int32); L is
    max lane length (optionally rounded up to `pad_to`)."""
    buf = np.frombuffer(bytes(stream), np.uint8)
    size = buf.size
    if n_lanes == 1:
        parts = [buf]
    elif n_lanes == 2:
        parts = [buf, buf[::-1]]
    else:
        num_pairs = n_lanes // 2
        has_tail = (n_lanes % 2) != 0
        num_offsets = num_pairs - 1 + (1 if has_tail else 0)
        header = num_offsets * 4
        offsets = buf[:header].view(np.int32)
        payload = buf[header:]
        payload_size = size - header
        parts = []
        for p in range(num_pairs):
            start = 0 if p == 0 else int(offsets[p - 1])
            if p < num_offsets:
                end = int(offsets[p])
            else:
                end = int(offsets[num_offsets - 1]) if has_tail else payload_size
            seg = payload[start:end]
            parts.append(seg)
            parts.append(seg[::-1])
        if has_tail:
            parts.append(payload[int(offsets[num_offsets - 1]):])
    lengths = np.array([p.size for p in parts], np.int32)
    L = max(int(lengths.max()), 8)
    if pad_to:
        L = -(-L // pad_to) * pad_to
    lanes = np.zeros((n_lanes, L), np.uint8)
    for i, p in enumerate(parts):
        lanes[i, :p.size] = p
    return lanes, lengths


def bucketed_lanes(stream, n_lanes, min_len=4096):
    """split_streams + power-of-two length bucketing so repeated decodes
    of similarly-sized streams reuse one compiled program."""
    lanes, _ = split_streams(stream, n_lanes)
    L = lanes.shape[1]
    Lb = max(min_len, 1 << (L - 1).bit_length())
    if Lb > L:
        lanes = np.pad(lanes, ((0, 0), (0, Lb - L)))
    return lanes


def _bank_arrays(cdf, cdf_lengths):
    """Pack a CDF bank for device use: (cdf int32 (N, per), lengths
    int32 (N,), max_value int32 (N,))."""
    cdf = np.ascontiguousarray(cdf, np.int32)
    lengths = np.asarray(cdf_lengths, np.int32).reshape(-1)
    max_value = lengths - 2
    return (jnp.asarray(cdf), jnp.asarray(lengths), jnp.asarray(max_value))


# -------------------------------------------------------------- device side

def init_state(lanes, lengths=None):
    """lanes (n, L) uint8 (device or host) -> decoder state pytree.

    State: dict of streams (n, L) uint8, st (n,) uint32 (rANS states,
    seeded from the first 4 LE bytes), ptr (n,) int32 (next byte)."""
    lanes = jnp.asarray(lanes, jnp.uint8)
    b = lanes[:, :4].astype(jnp.uint32)
    st = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    ptr = jnp.full((lanes.shape[0],), 4, jnp.int32)
    return {"streams": lanes, "st": st, "ptr": ptr}


def _pull(streams, st, ptr, need):
    """One predicated renorm byte pull per lane: where `need`, shift in
    the next stream byte (dec loop of rans.cc:142-144)."""
    L = streams.shape[1]
    byte = jnp.take_along_axis(
        streams, jnp.clip(ptr, 0, L - 1)[:, None], axis=1)[:, 0]
    st2 = (st << 8) | byte.astype(jnp.uint32)
    return jnp.where(need, st2, st), jnp.where(need, ptr + 1, ptr)


def _get_bits(streams, st, ptr, active):
    """dec_get_bits (rans.cc:124-131) on active lanes."""
    val = st & K_MAX_BYPASS
    st2 = st >> K_BYPASS_BITS
    need = active & (st2 < K_RANS_L)
    st2, ptr2 = _pull(streams, st2, ptr, need)
    st = jnp.where(active, st2, st)
    ptr = jnp.where(active, ptr2, ptr)
    return val, st, ptr


def make_decode_fn(cdf, cdf_lengths, n_lanes, cap):
    """Build decode(state, idx, count) -> (state, symbols int8 (cap,)).

    idx (cap,) uint8/int32 CDF-row per symbol in packed order; count is
    a (traced) scalar of valid symbols.  Lane i decodes the contiguous
    block [size0*i, size0*i+size_i), size0 = count // n_lanes, the last
    lane takes the remainder (rans.cc decode_y lane split).  Symbols
    past count are left 0.

    All arithmetic is integer, so results are bit-identical across
    backends and to the host decoder."""
    bank_cdf, bank_len, bank_maxv = _bank_arrays(cdf, cdf_lengths)
    per = bank_cdf.shape[1]
    col = jnp.arange(per, dtype=jnp.int32)

    def decode(state, idx, count):
        streams = state["streams"]
        idx = jnp.asarray(idx).astype(jnp.int32)
        count = jnp.asarray(count, jnp.int32)
        size0 = count // n_lanes
        lane_ids = jnp.arange(n_lanes, dtype=jnp.int32)
        offs = size0 * lane_ids
        sizes = jnp.where(lane_ids == n_lanes - 1,
                          count - size0 * (n_lanes - 1), size0)
        max_size = count - size0 * (n_lanes - 1)  # last lane is largest

        def body(carry):
            j, st, ptr, out = carry
            active = j < sizes
            gpos = jnp.clip(offs + j, 0, cap - 1)
            row = idx[gpos]
            crow = bank_cdf[row]                      # (n, per)
            maxv = bank_maxv[row]
            rlen = bank_len[row]
            cum = (st & K_DEC_MASK).astype(jnp.int32)
            # inverse CDF: first s >= 1 with cdf[s] > cum, minus 1
            # (dec loop rans.cc:136-138); padded tail is masked by rlen
            le = (crow <= cum[:, None]) & (col[None, :] >= 1) \
                 & (col[None, :] < rlen[:, None])
            s = le.sum(axis=1).astype(jnp.int32)
            low = jnp.take_along_axis(crow, s[:, None], 1)[:, 0]
            high = jnp.take_along_axis(crow, (s + 1)[:, None], 1)[:, 0]
            freq = (high - low).astype(jnp.uint32)
            st2 = freq * (st >> K_SCALE_BITS) \
                + (st & K_DEC_MASK) - low.astype(jnp.uint32)
            # <= 2 renorm pulls (state floor 128 after advance)
            ptr2 = ptr
            st2, ptr2 = _pull(streams, st2, ptr2, active & (st2 < K_RANS_L))
            st2, ptr2 = _pull(streams, st2, ptr2, active & (st2 < K_RANS_L))

            # bypass escape (rans.cc:147-158)
            esc = active & (s == maxv)

            def bypass(args):
                st3, ptr3 = args
                val, st3, ptr3 = _get_bits(streams, st3, ptr3, esc)
                n_byp = jnp.where(esc, val.astype(jnp.int32), 0)

                def more_count(c2):
                    v2, st4, ptr4, nb, more = c2
                    v2, st4, ptr4 = _get_bits(streams, st4, ptr4, more)
                    nb = nb + jnp.where(more, v2.astype(jnp.int32), 0)
                    more = more & (v2 == K_MAX_BYPASS)
                    return v2, st4, ptr4, nb, more

                more0 = esc & (val == K_MAX_BYPASS)
                _, st3, ptr3, n_byp, _ = lax.while_loop(
                    lambda c2: jnp.any(c2[4]), more_count,
                    (val, st3, ptr3, n_byp, more0))

                def chunks(c3):
                    k, st4, ptr4, raw = c3
                    act = esc & (k < n_byp)
                    v3, st4, ptr4 = _get_bits(streams, st4, ptr4, act)
                    raw = raw | jnp.where(
                        act, v3.astype(jnp.int32) << (k * K_BYPASS_BITS), 0)
                    return k + 1, st4, ptr4, raw

                k, st3, ptr3, raw = lax.while_loop(
                    lambda c3: jnp.any(esc & (c3[0] < n_byp)), chunks,
                    (jnp.zeros((), jnp.int32), st3, ptr3,
                     jnp.zeros((n_lanes,), jnp.int32)))
                return st3, ptr3, raw

            st2, ptr2, raw = lax.cond(
                jnp.any(esc), bypass,
                lambda args: (args[0], args[1],
                              jnp.zeros((n_lanes,), jnp.int32)),
                (st2, ptr2))

            value = jnp.where(esc, raw + maxv, s)
            sym = jnp.where(value % 2 == 1, (value + 1) // 2,
                            -((value + 1) // 2)).astype(jnp.int8)
            # inactive lanes write out-of-bounds -> dropped (their gpos
            # may alias another lane's block)
            gpos_w = jnp.where(active, offs + j, cap)
            out = out.at[gpos_w].set(sym, mode="drop")
            st = jnp.where(active, st2, st)
            ptr = jnp.where(active, ptr2, ptr)
            return j + 1, st, ptr, out

        out0 = jnp.zeros((cap,), jnp.int8)
        j, st, ptr, out = lax.while_loop(
            lambda c: c[0] < max_size, body,
            (jnp.zeros((), jnp.int32), state["st"], state["ptr"], out0))
        return {"streams": streams, "st": st, "ptr": ptr}, out

    return decode


def make_decode_fn_auto(cdf, cdf_lengths, n_lanes, cap, backend=None):
    """Pick the decode-loop implementation for the current backend:
    the Pallas Mosaic kernel on real TPU (~100x faster per symbol than
    the XLA while_loop), the XLA fallback elsewhere (CPU/interpret).
    Both are byte-conformant with the host coder (tests/
    test_device_decode.py, tests/test_pallas_decode.py)."""
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from .pallas_decode import make_decode_fn_pallas
        return make_decode_fn_pallas(cdf, cdf_lengths, n_lanes, cap)
    return make_decode_fn(cdf, cdf_lengths, n_lanes, cap)


def make_decode_z_fn(cdf, cdf_lengths, n_lanes, n, cdf_offset, ch):
    """decode_z(state) -> (state, z int8 (n,)): static count, CDF row
    (i % ch) + cdf_offset (rans.cc decode_z)."""
    idx = ((np.arange(n) % ch) + cdf_offset).astype(np.int32)
    dec = make_decode_fn(cdf, cdf_lengths, n_lanes, n)
    idx = jnp.asarray(idx)

    def decode_z(state):
        return dec(state, idx, n)

    return decode_z
