"""Video (DMC) training driver — CLI-compatible with the reference
train_video.py: 4-stage schedules per variant (frame_num growing to 129,
cascaded loss with activation checkpointing for long sequences), frozen
intra model seeding the DPB, AdamW + grad-clip 0.2 + non-finite skip.
"""

import argparse
import sys
import time
import os

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize pins jax to the TPU tunnel and ignores the
    # env var; jax.config wins (see tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")


def get_training_strategy(training_scheduling, frame_delay, model_structure):
    # [epoch_ref, lr, frame_num, cascaded, patch_w, patch_h]
    # (reference train_video.py:21-94)
    if model_structure == "ld":
        tables = {
            "stage0": [[0, 1e-4, 2, False, 256, 256]] * 5
                      + [[5, 1e-4, 3, False, 256, 256]] * 5
                      + [[10, 1e-4, 6, False, 256, 256]] * 46,
            "stage1": [[0, 5e-5, 8, True, 256, 256]] * 5
                      + [[5, 5e-5, 16, True, 256, 256]] * 5
                      + [[10, 5e-5, 24, True, 256, 256]] * 5
                      + [[15, 5e-5, 32, True, 256, 256]] * 15
                      + [[30, 5e-6, 32, True, 256, 256]] * 8,
            "stage2": [[0, 5e-5, 33, True, 512, 512]] * 14
                      + [[14, 5e-6, 33, True, 512, 512]] * 4
                      + [[18, 2e-5, 49, True, 512, 512]] * 7
                      + [[25, 2e-6, 49, True, 512, 512]] * 2
                      + [[27, 5e-6, 65, True, 512, 512]] * 7
                      + [[34, 2e-6, 65, True, 512, 512]] * 7,
            "stage3": [[0, 2e-6, 97, True, 512, 512]] * 2
                      + [[2, 5e-7, 129, True, 512, 512]] * 3,
        }
    else:
        fd = frame_delay
        tables = {
            "stage0": [[0, 1e-4, 1 + 1 * fd, False, 256, 256]] * 5
                      + [[5, 1e-4, 1 + 2 * fd, False, 256, 256]] * 5
                      + [[10, 1e-4, 1 + 4 * fd, False, 256, 256]] * 36,
            "stage1": [[0, 5e-5, 17, True, 256, 256]] * 2
                      + [[2, 5e-5, 25, True, 256, 256]] * 1
                      + [[3, 5e-5, 33, True, 256, 256]] * 3
                      + [[6, 5e-6, 33, True, 256, 256]] * 5,
            "stage2": [[0, 5e-5, 33, True, 512, 512]] * 10
                      + [[10, 5e-5, 49, True, 512, 512]] * 10
                      + [[20, 1e-5, 65, True, 512, 512]] * 12
                      + [[32, 2e-6, 65, True, 512, 512]] * 9,
            "stage3": [[0, 1e-5, 97, True, 512, 512]] * 2
                      + [[2, 2e-6, 129, True, 512, 512]] * 3,
        }
    return tables[training_scheduling]


def parse_args(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("-e", "--epochs", default=100, type=int)
    parser.add_argument("--lambdas", type=float, nargs="+", required=True)
    parser.add_argument("--model_path_i", type=str, required=True)
    parser.add_argument("--model_structure", type=str, default="ld",
                        choices=["htl", "hts", "ld"])
    parser.add_argument("-n", "--num_workers", type=int, default=4)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--train_dataset", type=str, required=True)
    parser.add_argument("--pretrain_path", type=str, default=None)
    parser.add_argument("--training_scheduling", type=str, default="stage0",
                        choices=["stage0", "stage1", "stage2", "stage3"])
    parser.add_argument("--tiny_model", action="store_true")
    parser.add_argument("--model_size", type=str, default=None,
                        choices=["tiny", "small", "full"],
                        help="overrides --tiny_model; `small` is the "
                             "mid-size trained-gate config (hts only)")
    parser.add_argument("--max_steps_per_epoch", type=int, default=-1)
    parser.add_argument("--data_repeat", type=int, default=1,
                        help="passes over the corpus per epoch (fresh "
                             "random crops each pass; for small corpora)")
    parser.add_argument("--max_frame_num", type=int, default=-1,
                        help="clamp the schedule's frame_num (e.g. 9 to "
                             "hold single-chunk rollouts: the cascaded "
                             "multi-chunk DPB feedback is unstable until "
                             "the single-chunk model is past random init)")
    parser.add_argument("--max_patch", type=int, default=-1,
                        help="clamp the schedule's patch size (e.g. when "
                             "the corpus frames are smaller than the "
                             "reference schedule's 512)")
    parser.add_argument("--device_data", action="store_true",
                        help="upload the whole corpus to device HBM once "
                             "(uint8) and gather crop/flip windows "
                             "on-device: per-step host->device traffic "
                             "drops to a few index scalars — decisive on "
                             "tunneled/low-bandwidth links where a "
                             "long-rollout uint8 batch is tens of MB")
    return parser.parse_args(argv)


def main(argv):
    args = parse_args(argv)

    import jax
    # persistent compile cache: the cascaded video-step programs are the
    # slowest compiles in the repo; cache them across runs (per-user
    # path; never override an explicit JAX_COMPILATION_CACHE_DIR)
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        import tempfile
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            tempfile.gettempdir(), f"dcvc_tpu_jax_cache_{os.getuid()}"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dcvc_tpu.data import VideoFolder, BatchLoader
    from dcvc_tpu.models.common import get_training_lambdas
    from dcvc_tpu.models.dmci import DMCI, DMCIConfig, TINY_CONFIG
    from dcvc_tpu.models.dmc_ht import (
        DMCHT, HTS_CONFIG, HTL_CONFIG, TINY_HT_CONFIG, TINY_HTL_CONFIG,
        SMALL_HT_CONFIG)
    from dcvc_tpu.models.dmc_ld import DMCLD, LD_CONFIG, TINY_LD_CONFIG
    from dcvc_tpu.parallel import make_mesh
    from dcvc_tpu.runtime.video_codec import _init_both_branches
    from dcvc_tpu.train import create_train_state
    from dcvc_tpu.train.step import make_optimizer
    from dcvc_tpu.train.video_step import make_video_train_step
    from dcvc_tpu.utils.checkpoint import (
        load_latest_status, load_params, save_params, save_status)
    import flax.serialization

    # ---- models
    size = args.model_size or ("tiny" if args.tiny_model else "full")
    if args.model_structure == "ld":
        assert size != "small", "no small LD config; use tiny or full"
        p_cfg = TINY_LD_CONFIG if size == "tiny" else LD_CONFIG
        p_model = DMCLD(cfg=p_cfg, dtype=jnp.float32)
    else:
        if size == "tiny":
            p_cfg = (TINY_HT_CONFIG if args.model_structure == "hts"
                     else TINY_HTL_CONFIG)
        elif size == "small":
            assert args.model_structure == "hts", "small config is hts-only"
            p_cfg = SMALL_HT_CONFIG
        else:
            p_cfg = HTS_CONFIG if args.model_structure == "hts" else HTL_CONFIG
        p_model = DMCHT(cfg=p_cfg, dtype=jnp.float32)
    frame_delay = p_cfg.frame_delay
    gop = frame_delay
    if 0 < args.max_frame_num <= gop:
        raise SystemExit(
            f"--max_frame_num must exceed the GOP size ({gop} for "
            f"{args.model_structure}): need at least 1 intra + 1 chunk")

    i_cfg = TINY_CONFIG if size == "tiny" else DMCIConfig()
    if args.model_path_i == "random":
        i_model = DMCI(cfg=i_cfg, dtype=jnp.float32)
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        i_params = jax.jit(lambda r1, r2: i_model.init(
            {"params": r1}, x0, jnp.zeros((1,), jnp.int32), r2))(
            jax.random.PRNGKey(10), jax.random.PRNGKey(11))["params"]
    else:
        i_params, i_hdr = load_params(args.model_path_i)
        if "config" in i_hdr:
            i_cfg = DMCIConfig(**i_hdr["config"])
        i_model = DMCI(cfg=i_cfg, dtype=jnp.float32)

    lambdas = get_training_lambdas(args.lambdas, p_cfg.qp_num)
    ch_src = getattr(p_cfg, "ch_src_intra", getattr(p_cfg, "ch_src", 192))
    if args.pretrain_path:
        p_params, _ = load_params(args.pretrain_path)
    else:
        p_params = _init_both_branches(
            p_model,
            jnp.zeros((1, 64, 64, 3 * gop), jnp.float32),
            jnp.zeros((1, 8, 8, ch_src), jnp.float32),
            jnp.zeros((1, 8, 8, p_cfg.ch_d), jnp.float32),
            jnp.zeros((1, 8, 8, p_cfg.ch_m), jnp.float32),
            jax.random.PRNGKey(0))

    # ---- mesh + sharding
    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    n_dev = len(jax.devices())
    assert args.batch_size % n_dev == 0

    # ---- frozen intra recon (seed) program
    from dcvc_tpu.train.step import to_model_domain

    @jax.jit
    def intra_recon(x, qp, rng):
        out = i_model.apply({"params": i_params}, to_model_domain(x),
                            qp, rng)
        return jax.lax.stop_gradient(out["x_hat"])

    strategy = get_training_strategy(args.training_scheduling, frame_delay,
                                     args.model_structure)
    _, lr0, frame_num0, _, pw, ph = strategy[0]
    # raw_rgb: uint8 transport + on-device color conversion (see
    # train_image.py note; the win is 4x larger here - gop frames/sample)
    dataset = VideoFolder(args.train_dataset, ph, pw, p_cfg.qp_num, lambdas,
                          frame_num=frame_num0, group_of_pictures=gop,
                          raw_rgb=True, cache=not args.device_data)

    # ---- device-resident corpus (see --device_data help)
    corpus_dev, gather_cache = None, {}
    if args.device_data:
        from PIL import Image
        seqs, frame_names = dataset.seqs, dataset.frames
        S = len(seqs)
        F = min(s["seq_length"] for s in seqs)
        Hc = min(s["height"] for s in seqs)
        Wc = min(s["width"] for s in seqs)
        corpus = np.zeros((S, F, Hc, Wc, 3), np.uint8)
        for si, s in enumerate(seqs):
            for fi in range(F):
                img = np.asarray(Image.open(os.path.join(
                    args.train_dataset, s["path"],
                    frame_names[fi])).convert("RGB"), np.uint8)
                corpus[si, fi] = img[:Hc, :Wc]
        print(f"device corpus: {corpus.nbytes / 1e9:.2f} GB "
              f"({S}x{F}x{Hc}x{Wc}), uploading once...", flush=True)
        # per-sequence uploads with a sync each: tunneled links sustain
        # ~20 MB/s on step-sized transfers but collapse when a single
        # GB-scale buffer floods the relay's queue
        t_up = time.time()
        parts = []
        for si in range(S):
            part = jax.device_put(jnp.asarray(corpus[si]), repl)
            part.block_until_ready()
            parts.append(part)
            if (si + 1) % 8 == 0:
                print(f"  uploaded {si + 1}/{S} seqs "
                      f"({time.time() - t_up:.0f}s)", flush=True)
        corpus_dev = jax.jit(lambda *xs: jnp.stack(xs),
                             out_shardings=repl)(*parts)
        corpus_dev.block_until_ready()
        del parts
        print(f"device corpus resident ({time.time() - t_up:.0f}s)",
              flush=True)
        del corpus

        def make_gather(n_frames, gph, gpw):
            n_ch = (n_frames - 1) // gop

            # corpus is a jit ARGUMENT, not a closure: a closed-over
            # device array would be baked into the HLO as a GB-scale
            # literal and shipped with every compile request
            def one(corpus, sid, st, y, x, fl):
                win = jax.lax.dynamic_slice(
                    corpus, (sid, st, y, x, 0),
                    (1, n_frames, gph, gpw, 3))[0]
                return jnp.where(fl, win[:, :, ::-1, :], win)

            @jax.jit
            def fn(corpus, sids, sts, ys, xs, fls):
                wins = jax.vmap(
                    lambda s_, t_, y_, x_, f_: one(corpus, s_, t_, y_,
                                                   x_, f_))(
                    sids, sts, ys, xs, fls)
                intra = wins[:, 0]
                rest = wins[:, 1:].reshape(-1, n_ch, gop, gph, gpw, 3)
                # channel order frame*3+c, matching np.concatenate of
                # gop frames on the channel axis (datasets.py)
                chunks = jnp.moveaxis(rest, 2, 4).reshape(
                    -1, n_ch, gph, gpw, gop * 3)
                return intra, chunks
            return fn

        def gather_for(n_frames, gph, gpw):
            k = (n_frames, gph, gpw)
            if k not in gather_cache:
                gather_cache[k] = make_gather(n_frames, gph, gpw)
            return gather_cache[k]

    tx = make_optimizer(lr0, clip_norm=0.2)
    state = create_train_state(p_params, tx)
    begin_epoch = 0
    status = load_latest_status(args.save_dir)
    if status is not None:
        state = state.replace(
            params=flax.serialization.from_state_dict(
                state.params, status["params"]),
            opt_state=flax.serialization.from_state_dict(
                state.opt_state, status["opt_state"]))
        begin_epoch = int(status["epoch"]) + 1
        print(f"resumed from epoch {begin_epoch}")
    state = jax.device_put(state, repl)

    step_rng = jax.random.PRNGKey(42)
    compiled = {}
    for epoch in range(begin_epoch, args.epochs):
        idx = min(len(strategy) - 1, epoch)
        _, lr, frame_num, cascaded, patch_w, patch_h = strategy[idx]
        if args.max_frame_num > 0:
            frame_num = min(frame_num, args.max_frame_num)
        if args.max_patch > 0:
            patch_w = min(patch_w, args.max_patch)
            patch_h = min(patch_h, args.max_patch)
        n_chunks = (frame_num - 1) // gop
        dataset.set_frame_num(1 + n_chunks * gop)
        dataset.set_patch_size(patch_w, patch_h)

        key = (lr, n_chunks, cascaded, patch_w, patch_h)
        if key not in compiled:
            tx = make_optimizer(lr, clip_norm=0.2)
            step = make_video_train_step(p_model, tx, lambdas, n_chunks,
                                         cascaded=cascaded,
                                         use_remat=patch_w > 256 or n_chunks > 4)
            compiled[key] = jax.jit(
                step, in_shardings=(repl, data_sh, data_sh, data_sh, repl),
                out_shardings=(repl, repl))
        train_step = compiled[key]

        t0 = time.time()
        if args.device_data:
            n_frames = 1 + n_chunks * gop
            assert n_frames <= F, (
                f"frame_num {n_frames} exceeds corpus seq length {F}; "
                f"clamp with --max_frame_num {F}")
            gather = gather_for(n_frames, patch_h, patch_w)
            steps = (len(dataset) // args.batch_size) * args.data_repeat
            if args.max_steps_per_epoch >= 0:
                steps = min(steps, args.max_steps_per_epoch)
            srng = np.random.default_rng(1000 + epoch)
            B = args.batch_size
            for i in range(steps):
                step_rng, s1, s2 = jax.random.split(step_rng, 3)
                sids = srng.integers(0, S, B)
                sts = srng.integers(0, F - n_frames + 1, B)
                ys = srng.integers(0, Hc - patch_h + 1, B)
                xs = srng.integers(0, Wc - patch_w + 1, B)
                fls = srng.random(B) < 0.5
                qp_np = srng.integers(0, p_cfg.qp_num, B)
                intra, chunks = gather(
                    corpus_dev,
                    jnp.asarray(sids, jnp.int32), jnp.asarray(sts, jnp.int32),
                    jnp.asarray(ys, jnp.int32), jnp.asarray(xs, jnp.int32),
                    jnp.asarray(fls))
                qp = jnp.asarray(qp_np, jnp.int32)
                seed = intra_recon(intra, qp, s1)
                seed = jax.device_put(seed, data_sh)
                chunks = jax.device_put(chunks, data_sh)
                qp = jax.device_put(qp, data_sh)
                state, metrics = train_step(state, seed, chunks, qp, s2)
                if i % 50 == 0:
                    m = jax.device_get(metrics)
                    print(f"Time: {time.time()-t0:.1f}s, epoch {epoch} "
                          f"step {i}: loss {m['loss']:.4f} "
                          f"mse {m['mse']:.5f} bpp {m['bpp']:.4f} "
                          f"gnorm {m['grad_norm']:.3f} lr {lr:.1e}",
                          flush=True)
                    t0 = time.time()
            save_status(args.save_dir, jax.device_get(state.params),
                        state.opt_state, epoch, p_cfg)
            continue
        loader = BatchLoader(dataset, args.batch_size, seed=epoch,
                             repeats=args.data_repeat,
                             workers=args.num_workers)
        for i, batch in enumerate(loader):
            if 0 <= args.max_steps_per_epoch <= i:
                break
            step_rng, s1, s2 = jax.random.split(step_rng, 3)
            intra = jnp.asarray(batch["frames"][0])       # (B, H, W, 3)
            chunks = jnp.stack(batch["frames"][1:], 1)    # (B, n, H, W, 3*gop)
            qp = jnp.asarray(batch["qp"])
            seed = intra_recon(intra, qp, s1)
            seed = jax.device_put(seed, data_sh)
            chunks = jax.device_put(chunks, data_sh)
            qp = jax.device_put(qp, data_sh)
            state, metrics = train_step(state, seed, chunks, qp, s2)
            if i % 50 == 0:
                m = jax.device_get(metrics)
                print(f"Time: {time.time()-t0:.1f}s, epoch {epoch} step {i}: "
                      f"loss {m['loss']:.4f} mse {m['mse']:.5f} "
                      f"bpp {m['bpp']:.4f} gnorm {m['grad_norm']:.3f} "
                      f"lr {lr:.1e}")
                t0 = time.time()
        save_status(args.save_dir, jax.device_get(state.params),
                    state.opt_state, epoch, p_cfg)

    save_params(f"{args.save_dir}/ckpt.bin", jax.device_get(state.params),
                p_cfg)
    print(f"saved final checkpoint to {args.save_dir}/ckpt.bin")


if __name__ == "__main__":
    main(sys.argv[1:])
