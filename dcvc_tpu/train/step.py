"""Training step with the reference's safety semantics
(train_image.py:51-98, train_video.py:118-189): AdamW, grad-norm clip,
skip-update on non-finite grad norm, per-sample QP with log-spaced lambda.

Data parallelism is expressed by sharding the batch over a mesh's `data`
axis; XLA inserts the gradient all-reduce (the NCCL DDP role).
"""

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..core.color import rgb2ycbcr


def to_model_domain(x):
    """uint8 RGB batches convert on-device (the loaders' raw_rgb fast
    path: 4x less H2D than float32 YCbCr); float input passes through."""
    if x.dtype == jnp.uint8:
        return rgb2ycbcr(x.astype(jnp.float32) / 255.0) - 0.5
    return x


@flax.struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr, clip_norm):
    """AdamW + global-norm clip (reference uses AdamW, clip 0.1 image /
    0.2 video)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr),
    )


def create_train_state(params, tx):
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_image_train_step(model, tx, lambdas):
    """Returns train_step(state, x, qp, rng) -> (state, metrics).

    x: (B, H, W, 3); qp: (B,) int32; lambdas: (qp_num,) f32 table.
    Non-finite grads skip the update (reference train_video.py:171-174).
    """
    lambdas = jnp.asarray(lambdas, jnp.float32)

    def loss_fn(params, x, qp, rng):
        x = to_model_domain(x)
        out = model.apply({"params": params}, x, qp, rng)
        lam = jnp.take(lambdas, qp)
        losses = lam * out["mse"] + out["bpp"]
        loss = jnp.mean(losses)
        metrics = {
            "loss": loss,
            "mse": jnp.mean(out["mse"]),
            "bpp": jnp.mean(out["bpp"]),
            "bits_y": jnp.mean(out["bits_y"]),
            "bits_z": jnp.mean(out["bits_z"]),
        }
        return loss, metrics

    def train_step(state, x, qp, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, x, qp, rng)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm)
        metrics["grad_norm"] = gnorm
        metrics["skipped"] = ~ok

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # skip the whole update when the grad norm is non-finite
        new_params = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_params, state.params)
        new_opt_state = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o) if isinstance(n, jnp.ndarray) else n,
            new_opt_state, state.opt_state)

        return TrainState(params=new_params, opt_state=new_opt_state,
                          step=state.step + 1), metrics

    return train_step
