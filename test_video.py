"""Evaluation entry point — CLI-compatible with the reference test_video.py.

Encodes each (class, sequence, rate) point to a real NAL bitstream, decodes
it back from disk, and writes the nested {class -> seq -> rate} result JSON.

TPU adaptation: one chip per process; the default worker=1 runs points
serially.  Checkpoints are dcvc_tpu native param files (utils/checkpoint);
pass 'random' to smoke-test with freshly initialized weights.
"""

import argparse
import json
import os
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the ambient axon sitecustomize pins jax to the TPU tunnel and
    # ignores the env var; jax.config wins (see tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")


def str2bool(v):
    return str(v).lower() in ["yes", "y", "true", "t", "1"]


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip_thres", type=float, default=0)
    parser.add_argument("--model_path_i", type=str, default="random")
    parser.add_argument("--model_path_p", type=str, default="random")
    parser.add_argument("--rate_num", type=int, default=4)
    parser.add_argument("--qp_i", type=int, nargs="+")
    parser.add_argument("--qp_p", type=int, nargs="+")
    parser.add_argument("--force_intra", type=str2bool, default=False)
    parser.add_argument("--force_frame_num", type=int, default=-1)
    parser.add_argument("--force_intra_period", type=int, default=-1)
    parser.add_argument("--reset_interval", type=int, default=32)
    parser.add_argument("--test_config", type=str, required=True)
    parser.add_argument("--force_root_path", type=str, default=None)
    parser.add_argument("--worker", "-w", type=int, default=1)
    parser.add_argument("--model_structure", type=str, default="ld",
                        choices=["htl", "hts", "ld"])
    parser.add_argument("--calc_ssim", type=str2bool, default=False)
    parser.add_argument("--check_existing", type=str2bool, default=False)
    parser.add_argument("--stream_path", type=str, default="out_bin")
    parser.add_argument("--save_decoded_frame", type=str2bool, default=False)
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--verbose_json", type=str2bool, default=False)
    parser.add_argument("--verbose", type=int, default=0)
    parser.add_argument("--tiny_model", type=str2bool, default=False,
                        help="use scaled-down configs (CI/smoke testing)")
    return parser.parse_args()


def build_codecs(args):
    import jax
    import jax.numpy as jnp
    from dcvc_tpu.models.dmci import DMCI, DMCIConfig, TINY_CONFIG
    from dcvc_tpu.models.dmc_ht import (
        DMCHT, HTS_CONFIG, HTL_CONFIG, TINY_HT_CONFIG, TINY_HTL_CONFIG)
    from dcvc_tpu.models.dmc_ld import DMCLD, LD_CONFIG, TINY_LD_CONFIG
    from dcvc_tpu.runtime import DMCICodec
    from dcvc_tpu.runtime.video_codec import DMCHTCodec, DMCLDCodec
    from dcvc_tpu.utils.checkpoint import load_params

    dtype = jnp.bfloat16

    if args.model_path_i == "random":
        i_cfg = TINY_CONFIG if args.tiny_model else DMCIConfig()
        i_codec = DMCICodec.init_random(jax.random.PRNGKey(0), cfg=i_cfg,
                                        dtype=dtype,
                                        skip_thres=args.skip_thres)
    else:
        params, hdr = load_params(args.model_path_i)
        # trained checkpoints carry their config; the flag is a fallback
        if "config" in hdr:
            i_cfg = DMCIConfig(**hdr["config"])
        else:
            i_cfg = TINY_CONFIG if args.tiny_model else DMCIConfig()
        i_codec = DMCICodec(params, cfg=i_cfg, dtype=dtype,
                            skip_thres=args.skip_thres)

    p_codec, frame_delay = None, 1
    if not args.force_intra:
        from dcvc_tpu.models.dmc_ht import DMCHTConfig
        from dcvc_tpu.models.dmc_ld import DMCLDConfig
        if args.model_structure == "ld":
            cfg = TINY_LD_CONFIG if args.tiny_model else LD_CONFIG
            cls = DMCLDCodec
        else:
            if args.tiny_model:
                cfg = (TINY_HT_CONFIG if args.model_structure == "hts"
                       else TINY_HTL_CONFIG)
            else:
                cfg = HTS_CONFIG if args.model_structure == "hts" else HTL_CONFIG
            cls = DMCHTCodec
        if args.model_path_p != "random":
            from dcvc_tpu.utils.checkpoint import load_header
            hdr = load_header(args.model_path_p)
            if "config" in hdr:
                cfg = (DMCLDConfig(**hdr["config"])
                       if args.model_structure == "ld"
                       else DMCHTConfig(**hdr["config"]))
        frame_delay = cfg.frame_delay
        if args.model_path_p == "random":
            # damp random kernels so the untrained temporal recurrence
            # stays finite over long sequences (smoke-test only)
            p_codec = cls.init_random(jax.random.PRNGKey(1), cfg=cfg,
                                      dtype=dtype, init_scale=0.5,
                                      skip_thres=args.skip_thres)
        else:
            params, _ = load_params(args.model_path_p)
            if args.model_structure == "ld":
                model = DMCLD(cfg=cfg, dtype=dtype)
            else:
                model = DMCHT(cfg=cfg, dtype=dtype)
            p_codec = cls(model, params, skip_thres=args.skip_thres)
    return i_codec, p_codec, frame_delay


_WORKER_STATE = {}


def _init_worker(args, slot_counter):
    """ProcessPoolExecutor initializer (reference test_video.py:413-419):
    each worker owns its codecs and an EXPLICIT worker slot (a shared
    counter, not a pid hash — pid hashing can map two workers onto the
    same chip while another idles)."""
    import jax

    with slot_counter.get_lock():
        slot = slot_counter.value
        slot_counter.value += 1
    n_dev = max(1, len(jax.devices()))
    try:
        jax.config.update("jax_default_device", jax.devices()[slot % n_dev])
    except Exception:
        pass
    i_codec, p_codec, frame_delay = build_codecs(args)
    _WORKER_STATE.update(i_codec=i_codec, p_codec=p_codec,
                         frame_delay=frame_delay)


def _run_point(cur):
    from dcvc_tpu.eval.harness import run_one_point_with_stream
    return run_one_point_with_stream(
        _WORKER_STATE["p_codec"], _WORKER_STATE["i_codec"],
        _WORKER_STATE["frame_delay"], cur)


def main():
    from dcvc_tpu.eval.harness import run_one_point_with_stream
    from dcvc_tpu.models.common import QP_NUM
    from dcvc_tpu.utils.logjson import dump_json

    begin_time = time.time()
    args = parse_args()
    args.skip_thres = max(0, args.skip_thres)

    with open(args.test_config) as f:
        config = json.load(f)

    if args.worker > 1:
        i_codec = p_codec = None
        frame_delay = 8 if args.model_structure in ("hts", "htl") else 1
        from dcvc_tpu.models.dmci import DMCIConfig, TINY_CONFIG
        qp_num = (TINY_CONFIG if args.tiny_model else DMCIConfig()).qp_num
        if args.model_path_i != "random":
            from dcvc_tpu.utils.checkpoint import load_header
            hdr = load_header(args.model_path_i)
            if "config" in hdr:
                qp_num = hdr["config"].get("qp_num", qp_num)
        if args.model_path_p != "random" and not args.force_intra:
            from dcvc_tpu.utils.checkpoint import load_header
            hdr = load_header(args.model_path_p)
            frame_delay = hdr.get("config", {}).get("frame_delay", frame_delay)
    else:
        i_codec, p_codec, frame_delay = build_codecs(args)
        qp_num = i_codec.cfg.qp_num

    rate_num = args.rate_num
    if args.qp_i is not None:
        assert len(args.qp_i) == rate_num
        qp_i = args.qp_i
    else:
        assert 2 <= rate_num <= qp_num
        qp_i = [int(i + 0.5) for i in np.linspace(0, qp_num - 1, num=rate_num)]
    qp_p = args.qp_p if args.qp_p is not None else qp_i
    if not args.force_intra:
        assert len(qp_p) == rate_num
    print(f"testing {rate_num} rates, using qp: {', '.join(str(q) for q in qp_i)}")

    root_path = args.force_root_path or config["root_path"]
    config = config["test_classes"]

    points = []
    count_frames = count_sequences = 0
    for ds_name in config:
        if config[ds_name]["test"] == 0:
            continue
        for seq in config[ds_name]["sequences"]:
            count_sequences += 1
            for rate_idx in range(rate_num):
                seq_cfg = config[ds_name]["sequences"][seq]
                cur = {
                    "rate_idx": rate_idx,
                    "qp_i": qp_i[rate_idx],
                    "qp_p": qp_p[rate_idx],
                    "force_intra": args.force_intra,
                    "reset_interval": args.reset_interval,
                    "seq": seq,
                    "src_type": config[ds_name]["src_type"],
                    "src_height": seq_cfg["height"],
                    "src_width": seq_cfg["width"],
                    "intra_period": seq_cfg["intra_period"],
                    "frame_num": seq_cfg["frames"],
                    "calc_ssim": args.calc_ssim,
                    "dataset_path": os.path.join(
                        root_path, config[ds_name]["base_path"]),
                    "check_existing": args.check_existing,
                    "stream_path": args.stream_path,
                    "save_decoded_frame": args.save_decoded_frame,
                    "ds_name": ds_name,
                    "verbose": args.verbose,
                    "verbose_json": args.verbose_json,
                }
                if args.force_intra:
                    cur["intra_period"] = 1
                if args.force_intra_period > 0:
                    cur["intra_period"] = args.force_intra_period
                if args.force_frame_num > 0:
                    cur["frame_num"] = args.force_frame_num
                count_frames += cur["frame_num"]

                bin_folder = os.path.join(cur["stream_path"], ds_name)
                os.makedirs(bin_folder, exist_ok=True)
                cur["src_path"] = os.path.join(cur["dataset_path"], seq)
                cur["bin_folder"] = bin_folder
                cur["curr_bin_path"] = os.path.join(
                    bin_folder, f"{seq}_q{cur['qp_i']}.bin")
                cur["curr_rec_path"] = cur["curr_bin_path"].replace(".bin", ".yuv")
                cur["curr_json_path"] = cur["curr_bin_path"].replace(".bin", ".json")

                points.append(cur)

    if args.worker > 1:
        import concurrent.futures
        import multiprocessing
        ctx = multiprocessing.get_context("spawn")
        slot_counter = ctx.Value("i", 0)
        with concurrent.futures.ProcessPoolExecutor(
                max_workers=args.worker, mp_context=ctx,
                initializer=_init_worker,
                initargs=(args, slot_counter)) as pool:
            results = list(pool.map(_run_point, points))
    else:
        results = [run_one_point_with_stream(p_codec, i_codec,
                                             frame_delay, cur)
                   for cur in points]
    for cur, result in zip(points, results):
        result["ds_name"] = cur["ds_name"]
        result["seq"] = cur["seq"]
        result["rate_idx"] = cur["rate_idx"]

    log_result = {}
    for res in results:
        log_result.setdefault(res["ds_name"], {}).setdefault(
            res["seq"], {})[f"{res['rate_idx']:03d}"] = res

    out_dir = os.path.dirname(args.output_path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(args.output_path, "w") as fp:
        dump_json(log_result, fp, float_digits=6, indent=2)

    total_minutes = (time.time() - begin_time) / 60
    print("Test finished")
    print(f"Tested {count_frames} frames from {count_sequences} sequences")
    print(f"Total elapsed time: {total_minutes:.1f} min")


if __name__ == "__main__":
    main()
    import sys
    sys.stdout.flush()
    sys.stderr.flush()
    # hard exit: tunnel/rANS worker threads can hold the process after
    # results are written
    import os
    os._exit(0)
