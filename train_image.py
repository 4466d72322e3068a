"""Image (DMCI) training driver — CLI-compatible with the reference
train_image.py: 105-epoch single-stage schedule with patch growth
256 -> 512, AdamW + grad-clip 0.1 + non-finite skip, random QP with
log-spaced lambdas, per-epoch resumable status checkpoints.

TPU adaptation: data parallelism is a jax.sharding mesh over all local
devices (batch sharded on the `data` axis); XLA inserts the gradient
all-reduce (the reference's NCCL DDP role, utils/common.py:190-205).
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


def get_training_strategy():
    # [epoch_ref, lr, patch_w, patch_h] (reference train_image.py:19-33)
    return (
        [[0,   2e-4, 256, 256]] * 45
        + [[49,  5e-5, 256, 256]] * 25
        + [[69,  1e-5, 256, 256]] * 20
        + [[90,  2e-4, 512, 512]] * 5
        + [[95,  5e-5, 512, 512]] * 4
        + [[99,  1e-5, 512, 512]] * 4
        + [[103, 1e-6, 512, 512]] * 2
        + [[105, 1e-6, 512, 512]]
    )


def parse_args(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("-e", "--epochs", default=104, type=int)
    parser.add_argument("--lambdas", type=float, nargs="+", required=True)
    parser.add_argument("-n", "--num_workers", type=int, default=4)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--train_dataset", type=str, required=True)
    parser.add_argument("--tiny_model", action="store_true")
    parser.add_argument("--model_size", type=str, default=None,
                        choices=["tiny", "small", "full"],
                        help="overrides --tiny_model; `small` is the "
                             "mid-size trained-gate config")
    parser.add_argument("--max_steps_per_epoch", type=int, default=-1)
    parser.add_argument("--data_repeat", type=int, default=1,
                        help="passes over the corpus per epoch (fresh "
                             "random crops each pass; for small corpora)")
    parser.add_argument("--max_patch", type=int, default=-1,
                        help="clamp the schedule's patch size (e.g. when "
                             "the corpus images are smaller than the "
                             "reference schedule's 512)")
    return parser.parse_args(argv)


def main(argv):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    # persistent compile cache (per-user path; never override an
    # explicit JAX_COMPILATION_CACHE_DIR)
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        import tempfile
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            tempfile.gettempdir(), f"dcvc_tpu_jax_cache_{os.getuid()}"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from dcvc_tpu.data import ImageFolder, BatchLoader
    from dcvc_tpu.models.common import get_training_lambdas
    from dcvc_tpu.models.dmci import DMCI, DMCIConfig, TINY_CONFIG, SMALL_CONFIG
    from dcvc_tpu.parallel import make_mesh
    from dcvc_tpu.train import create_train_state, make_image_train_step
    from dcvc_tpu.train.step import make_optimizer
    from dcvc_tpu.utils.checkpoint import (
        load_latest_status, save_params, save_status)
    import flax.serialization

    size = args.model_size or ("tiny" if args.tiny_model else "full")
    cfg = {"tiny": TINY_CONFIG, "small": SMALL_CONFIG,
           "full": DMCIConfig()}[size]
    model = DMCI(cfg=cfg, dtype=jnp.float32)
    lambdas = get_training_lambdas(args.lambdas, cfg.qp_num)

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    n_dev = len(jax.devices())
    assert args.batch_size % n_dev == 0, "batch must divide device count"

    strategy = get_training_strategy()
    _, lr0, pw, ph = strategy[0]
    # raw_rgb: ship uint8, convert to YCbCr inside the jitted step (4x
    # less H2D; dominates step time on tunneled device links)
    dataset = ImageFolder(args.train_dataset, ph, pw, cfg.qp_num, lambdas,
                          raw_rgb=True)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init_fn = jax.jit(lambda r1, r2: model.init(
        {"params": r1}, x0, jnp.zeros((1,), jnp.int32), r2))
    params = init_fn(rng, jax.random.PRNGKey(1))["params"]

    tx = make_optimizer(lr0, clip_norm=0.1)
    state = create_train_state(params, tx)
    begin_epoch = 0
    status = load_latest_status(args.save_dir)
    if status is not None:
        state = TrainStateRestore(state, status)
        begin_epoch = int(status["epoch"]) + 1
        print(f"resumed from epoch {begin_epoch}")

    state = jax.device_put(state, repl)
    train_step = jax.jit(make_image_train_step(model, tx, lambdas),
                         in_shardings=(repl, data_sh, data_sh, repl),
                         out_shardings=(repl, repl))

    step_rng = jax.random.PRNGKey(42)
    for epoch in range(begin_epoch, args.epochs):
        idx = min(len(strategy) - 1, epoch)
        _, lr, patch_w, patch_h = strategy[idx]
        if args.max_patch > 0:
            patch_w = min(patch_w, args.max_patch)
            patch_h = min(patch_h, args.max_patch)
        dataset.set_patch_size(patch_w, patch_h)
        # lr schedule: rebuild optimizer transform chain when lr changes
        tx = make_optimizer(lr, clip_norm=0.1)
        train_step = jax.jit(make_image_train_step(model, tx, lambdas),
                             in_shardings=(repl, data_sh, data_sh, repl),
                             out_shardings=(repl, repl))

        loader = BatchLoader(dataset, args.batch_size, seed=epoch,
                             repeats=args.data_repeat,
                             workers=args.num_workers)
        t0 = time.time()
        for i, batch in enumerate(loader):
            if 0 <= args.max_steps_per_epoch <= i:
                break
            step_rng, sub = jax.random.split(step_rng)
            x = jax.device_put(jnp.asarray(batch["x"]), data_sh)
            qp = jax.device_put(jnp.asarray(batch["qp"]), data_sh)
            state, metrics = train_step(state, x, qp, sub)
            if i % 200 == 0:
                m = jax.device_get(metrics)
                print(f"Time: {time.time()-t0:.1f}s, epoch {epoch} step {i}: "
                      f"loss {m['loss']:.4f} mse {m['mse']:.5f} "
                      f"bpp {m['bpp']:.4f} gnorm {m['grad_norm']:.3f} "
                      f"lr {lr:.1e}")
                t0 = time.time()
        save_status(args.save_dir, jax.device_get(state.params),
                    state.opt_state, epoch, cfg)

    save_params(f"{args.save_dir}/ckpt.bin", jax.device_get(state.params), cfg)
    print(f"saved final checkpoint to {args.save_dir}/ckpt.bin")


def TrainStateRestore(state, status):
    import flax.serialization
    params = flax.serialization.from_state_dict(state.params,
                                                status["params"])
    opt_state = flax.serialization.from_state_dict(state.opt_state,
                                                   status["opt_state"])
    return state.replace(params=params, opt_state=opt_state,
                         step=state.step)


if __name__ == "__main__":
    main(sys.argv[1:])
