"""Benchmark: DMCI image codec 1080p encode+decode FPS on one chip.

Protocol mirrors the reference speed benchmark (test_compress_time.py:
fixed resolution, skip_thres 0.15, warm-up discarded, steady-state
average).  Baseline: DCVC-UF-Intra 1080p on A100 = 81.5 FPS encode /
95.0 FPS decode (reference README "Image Compression Performance") ->
combined enc+dec cycle baseline 1/(1/81.5 + 1/95.0) = 43.87 FPS.

Prints ONE JSON line {metric, value, unit, vs_baseline}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from dcvc_tpu.runtime import DMCICodec

    h, w = 1080, 1920
    qp = 32
    warmup, iters = 2, 5

    codec = DMCICodec.init_random(jax.random.PRNGKey(0),
                                  dtype=jnp.bfloat16, skip_thres=0.15)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    # smooth content: realistic spatial correlation for entropy coding
    k = np.ones((8, 8), np.float32) / 64.0
    from scipy.signal import convolve2d
    for c in range(3):
        x[0, :, :, c] = convolve2d(x[0, :, :, c], k, mode="same", boundary="symm")
    x = np.clip(x, 0, 1) - 0.5

    # device-side bit-exactness check (avoids 48MB host fetches per iter)
    eq_check = jax.jit(lambda a, b: jnp.all(a == b))

    enc_times, dec_times = [], []
    xj = jnp.asarray(x)
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        res = codec.compress(xj, qp)
        jax.block_until_ready(res["x_hat"])
        t1 = time.perf_counter()
        out = codec.decompress(res["bit_stream"], qp, h, w, res["ec_parallel"])
        jax.block_until_ready(out["x_hat"])
        t2 = time.perf_counter()
        if i >= warmup:
            enc_times.append(t1 - t0)
            dec_times.append(t2 - t1)
        print(f"# iter {i}: enc {(t1-t0)*1000:.0f} ms dec {(t2-t1)*1000:.0f} ms",
              file=sys.stderr, flush=True)
        ok = bool(eq_check(res["x_hat"], out["x_hat"]))
        if not ok:
            print(json.dumps({"metric": "dmci_1080p_encdec_fps", "value": 0.0,
                              "unit": "fps", "vs_baseline": 0.0,
                              "error": "round-trip mismatch"}))
            return 1

    t_enc = float(np.mean(enc_times))
    t_dec = float(np.mean(dec_times))
    fps = 1.0 / (t_enc + t_dec)
    baseline = 1.0 / (1.0 / 81.5 + 1.0 / 95.0)  # A100 enc+dec cycle
    print(json.dumps({
        "metric": "dmci_1080p_encdec_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / baseline, 4),
    }))
    print(f"# enc {t_enc*1000:.1f} ms ({1/t_enc:.1f} fps), "
          f"dec {t_dec*1000:.1f} ms ({1/t_dec:.1f} fps), "
          f"stream {len(res['bit_stream'])} B, ec {res['ec_parallel']}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
