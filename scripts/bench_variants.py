"""Per-variant 1080p speed benchmark: DMCI (UF-Intra), HTL, HTS.

The reference publishes per-variant speed claims (UF-Intra 81.5/95.0 FPS
on A100, /root/reference/README.md §Image; DCVC-RT 125.2/112.8 FPS
video) — this script produces the repo's per-variant numbers with the
same protocol as bench.py (skip_thres 0.15, warm-up discarded, bit-exact
round-trip gate).

Prints one JSON line per variant to stdout.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_variants.py [dmci|htl|hts]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_frames(h, w, n, rng):
    from scipy.signal import convolve2d
    k = np.ones((8, 8), np.float32) / 64.0
    base = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    for c in range(3):
        base[:, :, c] = convolve2d(base[:, :, c], k, mode="same",
                                   boundary="symm")
    return [np.clip(base + rng.normal(0, 0.005, (h, w, 3)).astype(np.float32),
                    0, 1) - 0.5 for _ in range(n)]


def sync1(arr):
    return np.asarray(arr.ravel()[0:1])


def device_decode_ms_image(codec, jnp, h, w, qp=None, iters=3):
    """Pure device decode-chain time per frame (prior0 + 4x expand/step
    + synthesis), host entropy replaced by zero symbol buffers: the
    number a locally-attached host converges to once link latency is
    hidden (the ladder's device work is identical for any symbols)."""
    import time
    p = codec._get_programs(h, w)
    ph, pw, yh, yw, zh, zw, n_cand = p["dims"]
    z = jnp.zeros((1, zh, zw, codec.cfg.ch_z), jnp.int8)
    pad = jnp.zeros((min(1 << 16, n_cand),), jnp.int8)
    qp_arr = jnp.int32(min(32, codec.cfg.qp_num - 1) if qp is None else qp)

    def one():
        means, ctx, packed_idx, packed_pos, count, cond = p["prior0"](z)
        y_hat = jnp.zeros((1, yh, yw, codec.cfg.ch_y), jnp.float32)
        for k in range(4):
            y_q = p["expand"](pad, packed_pos)
            out = p["step"][k](y_q, means, y_hat, ctx)
            if k < 3:
                y_hat, means, packed_idx, packed_pos, count, cond = out
            else:
                y_hat = out
        return p["synthesis"](y_hat, qp_arr)

    sync1(one())  # compile + warm
    t0 = time.perf_counter()
    outs = [one() for _ in range(iters)]
    sync1(outs[-1])
    return (time.perf_counter() - t0) * 1000 / iters


def device_decode_ms_video(codec, jnp, h, w, qp=None, iters=3):
    """Pure device decode-chain time per chunk (adaptor + prior + steps
    + final + recon), zero symbol buffers."""
    import time
    p = codec._get_programs(h, w)
    ph, pw, yh, yw, zh, zw, n_cand = p["dims"]
    ch_y = codec.cfg.ch_y
    z = jnp.zeros((1, zh, zw, codec.cfg.ch_z), jnp.int8)
    qp_arr = jnp.int32(min(32, codec.cfg.qp_num - 1) if qp is None else qp)
    steps = codec.steps
    cap = steps * n_cand if codec.single_pass else n_cand
    pad = jnp.zeros((min(1 << 16, cap),), jnp.int8)

    def one(mem, ref):
        mem, ctx = p["adaptor"][True](mem, ref)
        out = p["prior"](z, mem, qp_arr)
        (q_enc, q_dec, means, spctx, packed_idx, packed_pos, count,
         cond) = out
        y_hat = jnp.zeros((1, yh, yw, ch_y), jnp.float32)
        if codec.single_pass:
            y_qs = p["expand_all"](pad, packed_pos)
            for k in range(steps):
                o = p["step"][k](y_qs[k], means, y_hat, spctx)
                y_hat, means = o if k < steps - 1 else (o, means)
        else:
            for k in range(steps):
                y_q = p["expand"](pad, packed_pos)
                o = p["step"][k](y_q, means, y_hat, spctx)
                if k < steps - 1:
                    y_hat, means, packed_idx, packed_pos, count, cond = o
                else:
                    y_hat = o
        feature, new_ref = p["final"][False](y_hat, q_dec, ctx, qp_arr)
        _, finish = codec._recon_job(p, feature, qp_arr)
        return finish(), mem, new_ref

    mem, ref = codec.memory, codec.ref_feature
    assert mem is not None, "run a real decode first (sets the DPB)"
    x, mem, ref = one(mem, ref)
    sync1(x)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        x, mem, ref = one(mem, ref)
    sync1(x)
    return (time.perf_counter() - t0) * 1000 / iters


def bench_dmci(jax, jnp, h, w, res="1080p", model_path=None,
               device_ec=False):
    from dcvc_tpu.runtime.image_codec import DMCICodec
    tag = "_devec" if device_ec else ""
    if model_path:
        # trained checkpoint: the operating point (skip rate, bpp) is the
        # model's real one — no simulation (addresses the random-weight
        # caveat; config comes from the checkpoint header, so a small
        # trained model benches at its own size/FLOPs, labeled _trained)
        from dcvc_tpu.models.dmci import DMCIConfig
        from dcvc_tpu.utils.checkpoint import load_params
        params, hdr = load_params(model_path)
        cfg = DMCIConfig(**hdr["config"]) if "config" in hdr else None
        codec = DMCICodec(params, cfg=cfg, dtype=jnp.bfloat16,
                          skip_thres=0.15, device_ec=device_ec)
        tag = "_trained" + tag
    else:
        codec = DMCICodec.init_random(jax.random.PRNGKey(0),
                                      dtype=jnp.bfloat16, skip_thres=0.15,
                                      device_ec=device_ec)
        # random weights at default init produce ~50%-coded 11-bit/sym
        # noise (bpp 5.5 — 20x any trained operating point) and the bench
        # becomes a pure D2H test; 0.65x kernel scaling lands at ~15%
        # coded / bpp 0.26, a realistic high-quality point for a 1080p
        # learned image codec (cross-checked against the trained-model
        # run's measured bpp — see the "bpp" field both runs report)
        codec.params = jax.tree_util.tree_map_with_path(
            lambda p, l: np.asarray(l * 0.65) if p[-1].key == "kernel" else l,
            codec.params)
    rng = np.random.default_rng(0)
    n = 8
    frames = [jnp.asarray(f[None]) for f in make_frames(h, w, n, rng)]
    sync1(jax.device_put(frames[0]))  # enter real-sync mode
    qp = min(32, codec.cfg.qp_num - 1)   # trained small cfgs have 16 QPs

    warmup, iters = 1, 3
    enc_times, dec_times = [], []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        results = codec.compress_many(frames, [qp] * n)
        sync1(results[-1]["x_hat"])
        t1 = time.perf_counter()

        t2 = time.perf_counter()
        outs = codec.decompress_many([r["bit_stream"] for r in results],
                                     [qp] * n, h, w,
                                     [r["ec_parallel"] for r in results])
        sync1(outs[-1]["x_hat"])
        t3 = time.perf_counter()
        print(f"# dmci iter {i}: {n}f enc {(t1-t0)*1000:.0f} ms "
              f"dec {(t3-t2)*1000:.0f} ms", file=sys.stderr, flush=True)
        if i >= warmup:
            enc_times.append((t1 - t0) / n)
            dec_times.append((t3 - t2) / n)
        for r, o in zip(results, outs):
            if not np.array_equal(np.asarray(r["x_hat"]),
                                  np.asarray(o["x_hat"])):
                print(json.dumps({"metric": f"dmci_{res}_encdec_fps",
                                  "value": 0.0, "unit": "fps",
                                  "error": "round-trip mismatch"}))
                return
    t_enc, t_dec = float(np.mean(enc_times)), float(np.mean(dec_times))
    dev_ms = device_decode_ms_image(codec, jnp, h, w)
    base = 1.0 / (1.0 / 81.5 + 1.0 / 95.0)   # UF-Intra A100 cycle @1080p
    fps = 1.0 / (t_enc + t_dec)
    bpp = sum(len(r["bit_stream"]) for r in results) * 8.0 / (h * w * n)
    print(json.dumps({"metric": f"dmci{tag}_{res}_encdec_fps",
                      "value": round(fps, 3), "unit": "fps",
                      # the published baseline is 1080p-only
                      "vs_baseline": round(fps / base, 4)
                      if res == "1080p" and not tag else None,
                      "enc_fps": round(1.0 / t_enc, 1),
                      "dec_fps": round(1.0 / t_dec, 1),
                      "dec_device_fps": round(1000.0 / dev_ms, 1),
                      "bpp": round(bpp, 4)}))


def bench_ht(jax, jnp, h, w, variant, res="1080p", model_path=None,
             device_ec=False):
    from dcvc_tpu.models.dmc_ht import HTL_CONFIG, HTS_CONFIG
    from dcvc_tpu.runtime.video_codec import DMCHTCodec
    tag = "_devec" if device_ec else ""
    if model_path:
        # trained checkpoint at its own (header) config — real operating
        # point, labeled _trained (see bench_dmci note)
        from dcvc_tpu.models.dmc_ht import DMCHTConfig
        from dcvc_tpu.utils.checkpoint import load_params
        params, hdr = load_params(model_path)
        cfg = (DMCHTConfig(**hdr["config"]) if "config" in hdr
               else (HTL_CONFIG if variant == "htl" else HTS_CONFIG))
        from dcvc_tpu.models.dmc_ht import DMCHT
        codec = DMCHTCodec(DMCHT(cfg=cfg, dtype=jnp.bfloat16), params,
                           skip_thres=0.15, device_ec=device_ec)
        tag = "_trained" + tag
    else:
        cfg = HTL_CONFIG if variant == "htl" else HTS_CONFIG
        codec = DMCHTCodec.init_random(jax.random.PRNGKey(0), cfg=cfg,
                                       dtype=jnp.bfloat16, skip_thres=0.15,
                                       init_scale=0.5, device_ec=device_ec)
    rng = np.random.default_rng(0)
    n_chunks, fd = 6, 8
    frames = make_frames(h, w, n_chunks * fd, rng)
    chunks = [jnp.asarray(np.concatenate(
        [f[None] for f in frames[ci * fd:(ci + 1) * fd]], axis=-1))
        for ci in range(n_chunks)]
    intra = jax.device_put(chunks[0][..., :3])
    sync1(intra)
    qp = min(32, codec.cfg.qp_num - 1)   # trained small cfgs have 16 QPs
    qps = [qp] * n_chunks
    n_frames = n_chunks * fd

    eq_check = jax.jit(lambda a, b: jnp.all(a == b))
    warmup, iters = 2, 3
    enc_times, dec_times = [], []
    for i in range(warmup + iters):
        codec.clear_dpb()
        codec.add_ref_feature_from_frame(intra)
        t0 = time.perf_counter()
        results = codec.compress_sequence(chunks, qps)
        sync1(codec.ref_feature)
        t1 = time.perf_counter()
        enc_ref = codec.ref_feature

        streams = [r["bit_stream"] for r in results]
        ecs = [r["ec_parallel"] for r in results]

        codec.clear_dpb()
        codec.add_ref_feature_from_frame(intra)
        t2 = time.perf_counter()
        outs = codec.decompress_sequence(streams, qps, h, w, ecs)
        sync1(outs[-1])
        t3 = time.perf_counter()
        print(f"# {variant} iter {i}: {n_frames}f enc {(t1-t0)*1000:.0f} ms "
              f"dec {(t3-t2)*1000:.0f} ms", file=sys.stderr, flush=True)
        if i >= warmup:
            enc_times.append((t1 - t0) / n_frames)
            dec_times.append((t3 - t2) / n_frames)
        if not bool(eq_check(enc_ref, codec.ref_feature)):
            print(json.dumps({"metric": f"dmc_{variant}_{res}_encdec_fps",
                              "value": 0.0, "unit": "fps",
                              "error": "round-trip mismatch"}))
            return
    t_enc, t_dec = float(np.mean(enc_times)), float(np.mean(dec_times))
    dev_ms = device_decode_ms_video(codec, jnp, h, w)
    base = 1.0 / (1.0 / 125.2 + 1.0 / 112.8)   # DCVC-RT A100 cycle @1080p
    fps = 1.0 / (t_enc + t_dec)
    bpp = sum(len(s) for s in streams) * 8.0 / (h * w * n_frames)
    print(json.dumps({"metric": f"dmc_{variant}{tag}_{res}_encdec_fps",
                      "value": round(fps, 3), "unit": "fps",
                      # the published baseline is 1080p-only
                      "vs_baseline": round(fps / base, 4)
                      if res == "1080p" and not tag else None,
                      "enc_fps": round(1.0 / t_enc, 1),
                      "dec_fps": round(1.0 / t_dec, 1),
                      "dec_device_fps": round(1000.0 * fd / dev_ms, 1),
                      "bpp": round(bpp, 4)}))


# the reference's optimized-speed envelope (README.md "Measure
# compression speed" note; hint tables d3x3.cu:7-25)
RESOLUTIONS = {
    "2160p": (2160, 3840),
    "1080p": (1080, 1920),
    "720p": (720, 1280),
    "480p": (480, 832),
    "240p": (240, 416),
}


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the ambient axon sitecustomize pins jax to the TPU tunnel and
        # ignores the env var; jax.config wins (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/dcvc_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    args = sys.argv[1:]
    res = "1080p"
    model_path = model_path_p = None
    if "--res" in args:
        i = args.index("--res")
        res = args[i + 1]
        del args[i:i + 2]
    if "--model_path" in args:      # trained DMCI checkpoint
        i = args.index("--model_path")
        model_path = args[i + 1]
        del args[i:i + 2]
    if "--model_path_p" in args:    # trained HT checkpoint
        i = args.index("--model_path_p")
        model_path_p = args[i + 1]
        del args[i:i + 2]
    device_ec = "--device_ec" in args   # Pallas on-device entropy decode
    if device_ec:
        args.remove("--device_ec")
    which = args or ["dmci", "htl", "hts"]
    h, w = RESOLUTIONS[res]
    if "dmci" in which:
        bench_dmci(jax, jnp, h, w, res, model_path=model_path,
                   device_ec=device_ec)
    if "htl" in which:
        bench_ht(jax, jnp, h, w, "htl", res, model_path=model_path_p,
                 device_ec=device_ec)
    if "hts" in which:
        bench_ht(jax, jnp, h, w, "hts", res, model_path=model_path_p,
                 device_ec=device_ec)


if __name__ == "__main__":
    main()
