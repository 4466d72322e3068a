"""Image-codec eval CLI: DMCI (UF-Intra), EVC, IntraNoAR, and the
CompressAI codecs over a Kodak-style PNG set with real bitstreams.

The counterpart of the reference EVC/test_image.py:121-235 (and the UF
image condition): per-image encode -> `.bin` -> decode-from-disk ->
PSNR, per-image entries + averages in the output JSON, bit-exactness
gate between encoder and decoder reconstructions.

  python test_image.py --i_frame_model dmci --image_path /path/to/kodak \
      --qp 32 --stream_path out_bin_img --output_path image_result.json

Models and their rate parameter:
  dmci       : --qp 0..63 (traced QP bank index; [-0.5,0.5] YCbCr domain)
  evc        : --q_scale float (EVC_LL plan, RGB [0,1])
  intra_noar : --q_scale float (HEM/DC/FM family intra, RGB [0,1])
  cheng2020 / bmshj2018 : fixed-rate models (RGB [0,1])
"""

import argparse
import glob
import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the ambient axon sitecustomize pins jax to the TPU tunnel and
    # ignores the env var; jax.config wins (see tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--i_frame_model", default="dmci",
                   choices=["dmci", "evc", "intra_noar", "cheng2020",
                            "bmshj2018"])
    p.add_argument("--image_path", required=True,
                   help="folder of .png images")
    p.add_argument("--qp", type=int, default=32)
    p.add_argument("--q_scale", type=float, default=1.0)
    p.add_argument("--rate_num", type=int, default=1)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--model_path", default=None,
                   help="trained or imported native checkpoint "
                        "(ckpt.bin / scripts/import_checkpoint.py "
                        "output); its stored config overrides --tiny")
    p.add_argument("--stream_path", default="out_bin_img")
    p.add_argument("--output_path", default="image_result.json")
    p.add_argument("--verbose", type=int, default=0)
    return p.parse_args()


def build_codec(args):
    import jax
    import jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    m = args.i_frame_model
    if m == "dmci":
        from dcvc_tpu.models.dmci import TINY_CONFIG, DMCIConfig
        from dcvc_tpu.runtime.image_codec import DMCICodec
        if args.model_path:
            from dcvc_tpu.utils.checkpoint import load_params
            params, hdr = load_params(args.model_path)
            cfg = DMCIConfig(**hdr["config"]) if "config" in hdr \
                else DMCIConfig()
            # trained gates run f32: the decision boundary is exact and
            # the checkpoint was trained in f32
            return DMCICodec(params, cfg=cfg, skip_thres=0.0,
                             dtype=jnp.float32)
        kw = {"cfg": TINY_CONFIG} if args.tiny else {}
        dt = jnp.float32 if args.tiny else jnp.bfloat16
        return DMCICodec.init_random(rng, dtype=dt, skip_thres=0.15, **kw)
    if m == "evc":
        from dcvc_tpu.legacy.evc import TINY_EVC_CONFIG
        from dcvc_tpu.runtime.evc_codec import EVCCodec
        kw = {"cfg": TINY_EVC_CONFIG} if args.tiny else {}
        codec = EVCCodec.init_random(rng, init_scale=0.4,
                                     dtype=jnp.float32, **kw)
    elif m == "intra_noar":
        from dcvc_tpu.legacy.hem_intra import TINY_INTRA_NOAR_CONFIG
        from dcvc_tpu.runtime.evc_codec import IntraNoARCodec
        kw = {"cfg": TINY_INTRA_NOAR_CONFIG} if args.tiny else {}
        codec = IntraNoARCodec.init_random(rng, init_scale=0.4,
                                           dtype=jnp.float32, **kw)
    elif m == "cheng2020":
        from dcvc_tpu.legacy.compressai_zoo import TINY_CHENG2020
        from dcvc_tpu.runtime.compressai_codec import Cheng2020Codec
        kw = {"cfg": TINY_CHENG2020} if args.tiny else {}
        codec = Cheng2020Codec.init_random(rng, **kw)
    else:
        from dcvc_tpu.legacy.compressai_zoo import TINY_HYPERPRIOR
        from dcvc_tpu.runtime.compressai_codec import HyperpriorCodec
        kw = {"cfg": TINY_HYPERPRIOR} if args.tiny else {}
        codec = HyperpriorCodec.init_random(rng, **kw)
    if args.model_path:
        # trained / imported weights (ckpt.bin from the trainers or
        # scripts/import_checkpoint.py); stored config overrides --tiny
        from dcvc_tpu.eval.family import _with_params
        codec = _with_params(codec, args.model_path)
    return codec


def code_one(codec, args, rgb01, h, w, bin_path):
    """Returns (x_hat_dec [0,1] rgb, x_hat_enc, n_bytes)."""
    import numpy as np
    import jax.numpy as jnp
    m = args.i_frame_model
    if m == "dmci":
        # UF domain: YCbCr [-0.5, 0.5] (test_video.py:119-121)
        from dcvc_tpu.core.color import rgb2ycbcr_np, ycbcr2rgb
        x = rgb2ycbcr_np(rgb01)[None] - 0.5
        res = codec.compress(x.astype(np.float32), args.qp)
        with open(bin_path, "wb") as f:
            f.write(res["bit_stream"])
        with open(bin_path, "rb") as f:
            stream = f.read()
        out = codec.decompress(stream, args.qp, h, w, res["ec_parallel"])

        def to_rgb(y):
            return np.asarray(ycbcr2rgb(jnp.asarray(np.asarray(y)[0]) + 0.5))
        return (to_rgb(out["x_hat"]), to_rgb(res["x_hat"]),
                len(res["bit_stream"]))
    if m in ("evc", "intra_noar"):
        res = codec.compress(rgb01[None].astype(np.float32),
                             args.q_scale, h, w)
        with open(bin_path, "wb") as f:
            f.write(res["bit_stream"])
        with open(bin_path, "rb") as f:
            stream = f.read()
        out = codec.decompress(stream, args.q_scale, h, w)
        return (np.asarray(out["x_hat"])[0], np.asarray(res["x_hat"])[0],
                len(res["bit_stream"]))
    # compressai two-string containers (encode_i format, DCVC
    # stream_helper.py:108-130)
    from dcvc_tpu.bitstream.legacy_container import (dcvc_decode_i,
                                                     dcvc_encode_i)
    res = codec.compress(rgb01[None].astype(np.float32), h, w)
    dcvc_encode_i(h, w, res["y_string"], res["z_string"], bin_path)
    hh, ww, y_s, z_s = dcvc_decode_i(bin_path)
    out = codec.decompress(y_s, z_s, hh, ww)
    return (np.asarray(out["x_hat"])[0], np.asarray(res["x_hat"])[0],
            os.path.getsize(bin_path))


def main():
    import numpy as np
    from PIL import Image
    from dcvc_tpu.utils.metrics import calc_psnr

    args = parse_args()
    os.makedirs(args.stream_path, exist_ok=True)
    codec = build_codec(args)

    images = sorted(glob.glob(os.path.join(args.image_path, "*.png")))
    if not images:
        print(f"no .png images under {args.image_path}", file=sys.stderr)
        return 2

    results, bad = {}, 0
    for path in images:
        name = os.path.basename(path)
        rgb = np.asarray(Image.open(path).convert("RGB"))
        h, w = rgb.shape[:2]
        rgb01 = rgb.astype(np.float32) / 255.0
        bin_path = os.path.join(args.stream_path,
                                name.replace(".png", ".bin"))
        t0 = time.time()
        x_dec, x_enc, n_bytes = code_one(codec, args, rgb01, h, w, bin_path)
        dt = time.time() - t0
        bitexact = bool(np.array_equal(x_dec, x_enc))
        bad += not bitexact
        rec = np.clip(np.round(x_dec * 255), 0, 255)
        psnr = calc_psnr(rgb.astype(np.float64), rec)
        results[name] = {
            "bpp": n_bytes * 8 / (h * w), "psnr": float(psnr),
            "bitexact": bitexact, "time": dt,
        }
        if args.verbose:
            print(f"{name}: bpp {results[name]['bpp']:.4f} "
                  f"psnr {psnr:.2f}{'' if bitexact else '  !! MISMATCH'}",
                  flush=True)

    avg = {"avg_bpp": float(np.mean([r["bpp"] for r in results.values()])),
           "avg_psnr": float(np.mean([r["psnr"] for r in results.values()])),
           "images": len(results)}
    with open(args.output_path, "w") as f:
        json.dump({"model": args.i_frame_model, "summary": avg,
                   "per_image": results}, f, indent=1)
    print(f"{args.i_frame_model}: {avg['images']} images, "
          f"bpp {avg['avg_bpp']:.4f}, psnr {avg['avg_psnr']:.2f} "
          f"-> {args.output_path}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
