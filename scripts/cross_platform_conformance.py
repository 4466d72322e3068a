"""TPU <-> CPU stream portability conformance (the DCVC-RT
integerization role, DCVC-family/DCVC-RT README: a stream encoded on
one device class must decode on another).

The repo's bit-exactness contract ("same executables on both sides")
silently assumes encoder and decoder share a platform.  This harness
measures the cross-platform reality: encode on one backend, decode on
the other, and compare

  * the exact coded symbol sequences (z + per-rung y + CDF indexes) —
    symbol equality means the entropy decode never desyncs, i.e. the
    STREAM is portable;
  * reconstruction closeness (float synthesis differs across backends
    in ulps, so x_hat is compared by PSNR, not bitwise).

Float convs are kept at f32 with jax_default_matmul_precision=highest
on both sides to minimize decision flips (scale->index, skip masks).

Usage:
  python scripts/cross_platform_conformance.py encode --platform cpu \
      --dir /tmp/xplat
  python scripts/cross_platform_conformance.py decode --platform tpu \
      --dir /tmp/xplat --report /tmp/xplat/report.json
  python scripts/cross_platform_conformance.py run   # both directions

`run` drives encode/decode subprocesses in both directions and writes
artifacts/CROSS_PLATFORM_rNN.json.
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QPS = [2, 8, 14]


def _setup(platform):
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/dcvc_tpu_jax_cache_xplat_{platform}")
    return jax


def _image(h=192, w=256):
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(99)
    img = gaussian_filter(rng.uniform(-0.5, 0.5, (h, w, 3)), 2.0)
    return np.ascontiguousarray(img, np.float32)[None]


def _build_codecs(jax, d):
    """Deterministic params: created once (on the first platform that
    runs) and reloaded from disk after, so both sides share weights."""
    import jax.numpy as jnp
    from dcvc_tpu.models.dmci import SMALL_CONFIG
    from dcvc_tpu.models.dmc_ht import SMALL_HT_CONFIG
    from dcvc_tpu.runtime import DMCICodec
    from dcvc_tpu.runtime.video_codec import DMCHTCodec
    from dcvc_tpu.utils.checkpoint import load_params, save_params

    pi = os.path.join(d, "params_i.bin")
    pp = os.path.join(d, "params_p.bin")
    if os.path.exists(pi):
        params_i, _ = load_params(pi)
        icodec = DMCICodec(params_i, cfg=SMALL_CONFIG, dtype=jnp.float32,
                           skip_thres=0.15)
    else:
        icodec = DMCICodec.init_random(jax.random.PRNGKey(0),
                                       cfg=SMALL_CONFIG, dtype=jnp.float32,
                                       skip_thres=0.15)
        save_params(pi, jax.device_get(icodec.params), SMALL_CONFIG)
    if os.path.exists(pp):
        params_p, _ = load_params(pp)
        from dcvc_tpu.models.dmc_ht import DMCHT
        pcodec = DMCHTCodec(DMCHT(cfg=SMALL_HT_CONFIG, dtype=jnp.float32),
                            params_p, skip_thres=0.15)
    else:
        pcodec = DMCHTCodec.init_random(jax.random.PRNGKey(1),
                                        cfg=SMALL_HT_CONFIG,
                                        dtype=jnp.float32, skip_thres=0.15,
                                        init_scale=0.5)
        save_params(pp, jax.device_get(pcodec.params), SMALL_HT_CONFIG)
    return icodec, pcodec


def _sym_blob(entries):
    """Flatten collected symbol dicts into a savable dict of arrays."""
    blob = {}
    for i, e in enumerate(entries):
        blob[f"{i}_z"] = e["z"]
        for k, (y, idx) in enumerate(zip(e["y"], e["idx"])):
            blob[f"{i}_y{k}"] = y
            blob[f"{i}_i{k}"] = idx
    return blob


def cmd_encode(args):
    jax = _setup(args.platform)
    os.makedirs(args.dir, exist_ok=True)
    icodec, pcodec = _build_codecs(jax, args.dir)
    x = _image()
    h, w = x.shape[1:3]

    icodec.collect_symbols = []
    img_streams, img_xhat = [], []
    for qp in QPS:
        res = icodec.compress(x, qp)
        img_streams.append((res["bit_stream"], res["ec_parallel"]))
        img_xhat.append(np.asarray(res["x_hat"]))

    f = pcodec.cfg.frame_delay
    frames = [np.roll(x, 2 * i, axis=2) for i in range(2 * f)]
    pcodec.collect_symbols = []
    pcodec.clear_dpb()
    pcodec.add_ref_feature_from_frame(img_xhat[1])
    vid_streams, vid_xhat = [], []
    for u in range(2):
        chunk = np.concatenate(frames[u * f:(u + 1) * f], axis=-1)
        res = pcodec.compress(chunk, 3, recon=True)
        vid_streams.append((res["bit_stream"], res["ec_parallel"]))
        vid_xhat.append(np.asarray(res["x_hat"]))

    np.savez(os.path.join(args.dir, f"enc_{args.platform}.npz"),
             h=h, w=w,
             img_xhat=np.stack(img_xhat),
             vid_xhat=np.stack(vid_xhat),
             n_img=len(QPS), qps=np.asarray(QPS),
             **{f"img_s{i}": np.frombuffer(s, np.uint8)
                for i, (s, _) in enumerate(img_streams)},
             **{f"img_e{i}": e for i, (_, e) in enumerate(img_streams)},
             **{f"vid_s{i}": np.frombuffer(s, np.uint8)
                for i, (s, _) in enumerate(vid_streams)},
             **{f"vid_e{i}": e for i, (_, e) in enumerate(vid_streams)},
             **{"imgsym_" + k: v
                for k, v in _sym_blob(icodec.collect_symbols).items()})
    print(f"encoded on {args.platform} -> {args.dir}")


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else -10 * np.log10(mse)


def cmd_decode(args):
    jax = _setup(args.platform)
    icodec, pcodec = _build_codecs(jax, args.dir)
    enc = np.load(os.path.join(args.dir, f"enc_{args.src}.npz"))
    h, w = int(enc["h"]), int(enc["w"])
    report = {"encode_platform": args.src,
              "decode_platform": args.platform, "image": [], "video": []}

    icodec.collect_symbols = []
    for i, qp in enumerate(enc["qps"]):
        stream = enc[f"img_s{i}"].tobytes()
        out = icodec.decompress(stream, int(qp), h, w,
                                int(enc[f"img_e{i}"]))
        got = np.asarray(out["x_hat"])
        want = enc["img_xhat"][i]
        col = icodec.collect_symbols[-1]
        sym_ok = bool(
            np.array_equal(col["z"], enc[f"imgsym_{i}_z"]) and
            all(np.array_equal(col["y"][k], enc[f"imgsym_{i}_y{k}"]) and
                np.array_equal(col["idx"][k], enc[f"imgsym_{i}_i{k}"])
                for k in range(4)))
        report["image"].append({
            "qp": int(qp), "symbols_identical": sym_ok,
            "recon_psnr_vs_encoder": round(_psnr(got, want), 2),
            "recon_bitexact": bool(np.array_equal(got, want))})

    pcodec.clear_dpb()
    pcodec.add_ref_feature_from_frame(enc["img_xhat"][1])
    f = pcodec.cfg.frame_delay
    for u in range(2):
        stream = enc[f"vid_s{u}"].tobytes()
        out = pcodec.decompress(stream, 3, h, w, int(enc[f"vid_e{u}"]))
        got = np.asarray(out["x_hat"])
        want = enc["vid_xhat"][u]
        report["video"].append({
            "chunk": u,
            "recon_psnr_vs_encoder": round(_psnr(got, want), 2),
            "recon_bitexact": bool(np.array_equal(got, want))})

    with open(args.report, "w") as fo:
        json.dump(report, fo, indent=1)
    print(json.dumps(report, indent=1))


def cmd_run(args):
    d = args.dir
    os.makedirs(d, exist_ok=True)
    me = os.path.abspath(__file__)
    env_cpu = dict(os.environ, JAX_PLATFORMS="cpu")
    env_tpu = dict(os.environ)
    env_tpu.pop("JAX_PLATFORMS", None)

    def run(cmd, env):
        r = subprocess.run([sys.executable, me] + cmd, env=env, cwd=REPO)
        assert r.returncode == 0, cmd

    reports = {}
    for src, dst, env_e, env_d in [("tpu", "cpu", env_tpu, env_cpu),
                                   ("cpu", "tpu", env_cpu, env_tpu)]:
        run(["encode", "--platform", src, "--dir", d], env_e)
        rp = os.path.join(d, f"report_{src}_to_{dst}.json")
        run(["decode", "--platform", dst, "--src", src, "--dir", d,
             "--report", rp], env_d)
        with open(rp) as fi:
            reports[f"{src}_encode_{dst}_decode"] = json.load(fi)

    art = {
        "note": ("cross-platform stream portability (DCVC-RT "
                 "integerization role): encode on one backend, decode on "
                 "the other; symbols_identical == no entropy desync "
                 "(stream portable); recon compared by PSNR because "
                 "float synthesis differs across backends in ulps"),
        "f32_highest_precision": True,
        "results": reports,
    }
    out = os.path.join(REPO, "artifacts", args.artifact)
    with open(out, "w") as fo:
        json.dump(art, fo, indent=1)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("encode")
    e.add_argument("--platform", required=True, choices=["cpu", "tpu"])
    e.add_argument("--dir", required=True)
    dd = sub.add_parser("decode")
    dd.add_argument("--platform", required=True, choices=["cpu", "tpu"])
    dd.add_argument("--src", required=True, choices=["cpu", "tpu"])
    dd.add_argument("--dir", required=True)
    dd.add_argument("--report", required=True)
    r = sub.add_parser("run")
    r.add_argument("--dir", default="/tmp/dcvc_tpu_xplat")
    r.add_argument("--artifact", default="CROSS_PLATFORM_r05.json")
    args = ap.parse_args()
    {"encode": cmd_encode, "decode": cmd_decode, "run": cmd_run}[args.cmd](args)


if __name__ == "__main__":
    main()
