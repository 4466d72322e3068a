"""Benchmark: flagship DMC-HTS video codec, 1080p per-frame enc+dec FPS.

Protocol mirrors the reference speed benchmark (test_compress_time.py:
HEVC_B 1080p sequence, skip_thres 0.15, warm-up discarded, FPS =
total_frames / elapsed = g_frame_delay / avg_chunk_time).  A multi-chunk
sequence is coded per pass so the runtime's cross-chunk pipelining (the
TPU analog of the reference proxies' CPU/GPU entropy overlap,
dmc_hts_proxy.cpp:764-830) is exercised; the bitstream round-trip must
be bit-exact (encoder vs decoder DPB after the whole sequence) or the
result is zeroed.

Baseline: the closest machine-readable reference speed figure is
DCVC-RT 1080p on A100 = 125.2 FPS encode / 112.8 FPS decode
(DCVC-family/DCVC-RT/README.md) -> combined cycle 59.34 FPS.

Prints ONE JSON line {metric, value, unit, vs_baseline}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    # persistent compilation cache: the large fused codec programs compile
    # once per machine instead of once per process
    jax.config.update("jax_compilation_cache_dir", "/tmp/dcvc_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from dcvc_tpu.runtime.video_codec import DMCHTCodec

    h, w = 1080, 1920
    qp = 32
    warmup, iters = 2, 4
    frame_delay = 8
    n_chunks = 6                      # 48 frames per timed pass

    codec = DMCHTCodec.init_random(jax.random.PRNGKey(0),
                                   dtype=jnp.bfloat16, skip_thres=0.15,
                                   init_scale=0.5)

    rng = np.random.default_rng(0)
    from scipy.signal import convolve2d
    k = np.ones((8, 8), np.float32) / 64.0
    base = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    for c in range(3):
        base[:, :, c] = convolve2d(base[:, :, c], k, mode="same",
                                   boundary="symm")
    chunks = []
    for ci in range(n_chunks):
        frames = [np.clip(np.roll(base, ci * 8 + i, 1)
                          + rng.normal(0, 0.005, (h, w, 3)).astype(np.float32),
                          0, 1) - 0.5
                  for i in range(frame_delay)]
        chunks.append(jnp.asarray(
            np.concatenate([f[None] for f in frames], axis=-1)))

    eq_check = jax.jit(lambda a, b: jnp.all(a == b))
    # the DPB seed is the intra codec's reconstruction, which is
    # device-resident in the real pipeline (the reference protocol
    # brackets exclude source upload, test_video.py:194-219)
    intra = jax.device_put(chunks[0][..., :3])
    jax.block_until_ready(intra)
    _ = np.asarray(intra[0, 0, 0, :1])   # enter real-sync mode (tunnel)

    qps = [qp] * n_chunks
    n_frames = n_chunks * frame_delay
    enc_times, dec_times = [], []
    for i in range(warmup + iters):
        codec.clear_dpb()
        codec.add_ref_feature_from_frame(intra)
        t0 = time.perf_counter()
        results = codec.compress_sequence(chunks, qps)
        _ = np.asarray(codec.ref_feature.ravel()[0:1])   # drain queue
        t1 = time.perf_counter()
        enc_ref = codec.ref_feature

        streams = [r["bit_stream"] for r in results]
        ecs = [r["ec_parallel"] for r in results]
        nbytes = sum(len(s) for s in streams)

        codec.clear_dpb()
        codec.add_ref_feature_from_frame(intra)
        t2 = time.perf_counter()
        outs = codec.decompress_sequence(streams, qps, h, w, ecs)
        _ = np.asarray(outs[-1].ravel()[0:1])            # drain queue
        t3 = time.perf_counter()

        if i >= warmup:
            enc_times.append(t1 - t0)
            dec_times.append(t3 - t2)
        print(f"# iter {i}: {n_frames}f enc {(t1-t0)*1000:.0f} ms "
              f"dec {(t3-t2)*1000:.0f} ms stream {nbytes} B",
              file=sys.stderr, flush=True)
        # bit-exactness gate: the decoder's final feature-domain DPB must
        # equal the encoder's bit-for-bit after the WHOLE sequence (any
        # earlier mismatch propagates through the temporal recurrence)
        if not bool(eq_check(enc_ref, codec.ref_feature)):
            print(json.dumps({"metric": "dmc_hts_1080p_encdec_fps",
                              "value": 0.0, "unit": "fps",
                              "vs_baseline": 0.0,
                              "error": "round-trip mismatch"}))
            return 1

    t_enc = float(np.mean(enc_times)) / n_frames   # per frame
    t_dec = float(np.mean(dec_times)) / n_frames
    fps = 1.0 / (t_enc + t_dec)
    baseline = 1.0 / (1.0 / 125.2 + 1.0 / 112.8)  # DCVC-RT A100 cycle
    print(json.dumps({
        "metric": "dmc_hts_1080p_encdec_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / baseline, 4),
    }))
    print(f"# per-frame enc {t_enc*1000:.1f} ms ({1/t_enc:.1f} fps), "
          f"dec {t_dec*1000:.1f} ms ({1/t_dec:.1f} fps)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    sys.stderr.flush()
    # hard exit: the axon/rANS worker threads are non-daemon and can
    # keep the process alive after results are printed
    import os
    os._exit(rc)
