"""Decompose the DMC-HTS 1080p cycle: per-program device time, host rANS
time, transfer stalls.  Not a test — a tuning tool (run on the real chip).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t_ms(fn, *args, reps=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000, out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/dcvc_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from dcvc_tpu.runtime.video_codec import DMCHTCodec

    h, w = 1080, 1920
    qp = 32
    codec = DMCHTCodec.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                                   skip_thres=0.15, init_scale=0.5)
    rng = np.random.default_rng(0)
    chunk = rng.uniform(-0.35, 0.35, (1, h, w, 24)).astype(np.float32)
    chunk_j = jnp.asarray(chunk)
    intra = jax.device_put(chunk_j[..., :3])
    jax.block_until_ready(intra)

    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    res = codec.compress(chunk_j, qp)  # warm all enc programs
    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    out = codec.decompress(res["bit_stream"], qp, h, w, res["ec_parallel"])
    jax.block_until_ready(out["x_hat"])

    p = codec._get_programs(h, w)
    ph, pw, yh, yw, zh, zw, n_cand = p["dims"]
    print(f"dims: padded {ph}x{pw} y {yh}x{yw} z {zh}x{zw} n_cand {n_cand}")

    codec.clear_dpb()
    codec.add_ref_feature_from_frame(intra)
    qp_arr = jnp.int32(qp)

    ms, (mem, ctx) = t_ms(p["adaptor"][False], codec.ref_feature,
                          codec.ref_feature)
    print(f"adaptor_i           {ms:7.2f} ms")
    ms, (y, z_int8) = t_ms(p["enc_analysis"], chunk_j, ctx, qp_arr)
    print(f"enc_analysis        {ms:7.2f} ms")
    ms, pr = t_ms(p["prior"], z_int8, mem, qp_arr)
    (q_enc, q_dec, means, spctx, packed_idx, packed_pos, count,
     cond_all) = pr
    print(f"prior(+compact)     {ms:7.2f} ms")

    y_hat = jnp.zeros((1, yh, yw, codec.cfg.ch_y), jnp.float32)
    y_qs = []
    means_k = means
    for k in range(codec.steps):
        ms, y_q = t_ms(p["enc_quant"][k], y, q_enc, means_k, cond_all)
        print(f"enc_quant[{k}]        {ms:7.2f} ms")
        y_qs.append(y_q)
        ms, o = t_ms(p["step"][k], y_q, means_k, y_hat, spctx)
        print(f"step[{k}]             {ms:7.2f} ms")
        if k < codec.steps - 1:
            y_hat, means_k = o
        else:
            y_hat = o
    ms, sym = t_ms(p["enc_finalize"], cond_all, packed_idx, *y_qs)
    print(f"enc_finalize        {ms:7.2f} ms")
    ms, (feature, new_ref) = t_ms(p["final"][False], y_hat, q_dec, ctx,
                                  qp_arr)
    print(f"final(dec trunk)    {ms:7.2f} ms")
    ms, frames = t_ms(p["recon"], feature, qp_arr)
    print(f"recon(heads+pack)   {ms:7.2f} ms")

    c = int(count)
    print(f"count = {c}")
    # host-side timings
    sym_np = np.asarray(jax.lax.slice(sym, (0,), (c,)))
    z_np = np.asarray(z_int8)
    ch_z = codec.cfg.ch_z
    ec = 8
    t0 = time.perf_counter()
    codec.encoder.reset()
    codec.encoder.set_parallel(ec)
    codec.encoder.encode_y(sym_np)
    codec.encoder.encode_z(z_np.reshape(-1), qp * ch_z, ch_z)
    codec.encoder.flush()
    bs = codec.encoder.get_encoded_stream()
    t1 = time.perf_counter()
    print(f"host rANS encode    {(t1-t0)*1000:7.2f} ms ({len(bs)} B)")

    codec.decoder.set_parallel(ec)
    codec.decoder.set_stream(bs)
    t0 = time.perf_counter()
    codec.decoder.decode_z(zh * zw * ch_z, qp * ch_z, ch_z)
    zd = codec.decoder.get_decoded()
    t1 = time.perf_counter()
    print(f"host rANS decode_z  {(t1-t0)*1000:7.2f} ms")
    idx_np = np.asarray(jax.lax.slice(packed_idx, (0,), (c,)))
    t0 = time.perf_counter()
    codec.decoder.decode_y(idx_np)
    dy = codec.decoder.get_decoded()
    t1 = time.perf_counter()
    print(f"host rANS decode_y  {(t1-t0)*1000:7.2f} ms")

    # transfer costs
    for name, arr in [("D2H sym (count)", sym_np),
                      ("D2H z", z_np)]:
        print(f"  {name}: {arr.nbytes} B")
    t0 = time.perf_counter()
    _ = np.asarray(packed_idx)
    t1 = time.perf_counter()
    print(f"D2H packed_idx full {(t1-t0)*1000:7.2f} ms "
          f"({packed_idx.nbytes} B)")
    x = jnp.zeros((1,), jnp.float32)
    t0 = time.perf_counter()
    _ = np.asarray(x)
    t1 = time.perf_counter()
    print(f"D2H 4B scalar       {(t1-t0)*1000:7.2f} ms")
    big = jnp.zeros((1 << 20,), jnp.int8)
    jax.block_until_ready(big)
    t0 = time.perf_counter()
    _ = np.asarray(big)
    t1 = time.perf_counter()
    print(f"D2H 1MB             {(t1-t0)*1000:7.2f} ms")
    h2d = np.zeros((1 << 20,), np.int8)
    t0 = time.perf_counter()
    a = jax.device_put(h2d)
    jax.block_until_ready(a)
    t1 = time.perf_counter()
    print(f"H2D 1MB             {(t1-t0)*1000:7.2f} ms")

    # end-to-end again for reference
    for it in range(3):
        codec.clear_dpb()
        codec.add_ref_feature_from_frame(intra)
        t0 = time.perf_counter()
        res = codec.compress(chunk_j, qp)
        jax.block_until_ready(codec.ref_feature)
        t1 = time.perf_counter()
        codec.clear_dpb()
        codec.add_ref_feature_from_frame(intra)
        t2 = time.perf_counter()
        out = codec.decompress(res["bit_stream"], qp, h, w,
                               res["ec_parallel"])
        jax.block_until_ready(out["x_hat"])
        t3 = time.perf_counter()
        print(f"e2e enc {(t1-t0)*1000:6.1f} ms dec {(t3-t2)*1000:6.1f} ms")
    return 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    import os
    os._exit(rc)
