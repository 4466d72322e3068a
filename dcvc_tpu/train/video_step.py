"""Video training step: cascaded multi-chunk BPTT with rematerialization.

Reference semantics (train_video.py:118-189):
  * the intra model seeds ref_feature with a no-grad reconstruction;
    training-mode add_ref_feature_from_frame = pixel_unshuffle(frame, 8)
  * cascaded=True backprops through the whole GOP list (long sequences up
    to 129 frames use activation checkpointing - CkptModule); here the
    chunk loop is a lax.scan with jax.checkpoint on the body
  * cascaded=False detaches state between chunks (stop_gradient)
  * per-chunk RD loss with the variant's dist weights; AdamW, clip 0.2,
    non-finite skip
"""

import jax
import jax.numpy as jnp
import optax

from ..core.shuffle import pixel_unshuffle
from ..models import common as mcommon
from .step import TrainState, to_model_domain


def make_video_train_step(model, tx, lambdas, n_chunks, cascaded=True,
                          use_remat=True):
    """model: DMCHT or DMCLD; chunks: (B, n_chunks, H, W, 3*gop).

    Returns train_step(state, intra_recon, chunks, qp, rng) ->
    (state, metrics).  intra_recon: (B, H, W, 3) no-grad intra seed.
    """
    lambdas = jnp.asarray(lambdas, jnp.float32)
    is_ht = hasattr(model.cfg, "is_hts")
    frame_delay = model.cfg.frame_delay

    def chunk_rd(result, poc0):
        if is_ht:
            mse = mcommon.mse_8frames_sum(result["mse"], [1.5, 0.16, 0.4])
        else:
            # LD per-frame dist weight by fa schedule position
            # (video_model_ld.py:231-240, index_map [0,1,0,2,0,2,0,2])
            index_map = jnp.asarray([0, 1, 0, 2, 0, 2, 0, 2])
            weights = jnp.asarray([0.52, 1.33, 0.83])
            fa_idx = index_map[poc0 % 8]
            mse = result["mse"] * weights[fa_idx]
        return {"mse": mse, "bpp": result["bpp"]}

    def loss_fn(params, intra_recon, chunks, qp, rng):
        variables = {"params": params}
        if chunks.dtype == jnp.uint8:
            # (B, n, H, W, 3*gop) uint8 RGB -> YCbCr-centered per frame
            b, n, h, w, c = chunks.shape
            chunks = to_model_domain(
                chunks.reshape(b, n, h, w, c // 3, 3)).reshape(
                b, n, h, w, c)
        ref = pixel_unshuffle(jax.lax.stop_gradient(intra_recon), 8)
        ref = ref.astype(model.dtype)

        def run_chunk(carry, inputs):
            ref, memory, poc = carry
            chunk, chunk_rng = inputs
            result, feature, memory = model.apply(
                variables, chunk, ref, memory, qp, chunk_rng)
            rd = chunk_rd(result, poc + 1)
            lam = jnp.take(lambdas, qp)
            losses = lam * rd["mse"] + rd["bpp"]
            if not cascaded:
                feature = jax.lax.stop_gradient(feature)
                memory = jax.lax.stop_gradient(memory)
            return ((feature, memory, poc + frame_delay),
                    (jnp.mean(losses), jnp.mean(rd["bpp"]),
                     jnp.mean(rd["mse"])))

        body = jax.checkpoint(run_chunk) if use_remat else run_chunk

        rngs = jax.random.split(rng, n_chunks)
        # first chunk outside the scan: memory starts as None (adaptor_i)
        carry, out0 = body((ref, None, jnp.int32(0)),
                           (chunks[:, 0], rngs[0]))
        if n_chunks > 1:
            scan_chunks = jnp.moveaxis(chunks[:, 1:], 1, 0)
            carry, outs = jax.lax.scan(body, carry, (scan_chunks, rngs[1:]))
            losses = jnp.concatenate([out0[0][None], outs[0]])
            bpps = jnp.concatenate([out0[1][None], outs[1]])
            mses = jnp.concatenate([out0[2][None], outs[2]])
        else:
            losses, bpps, mses = out0[0][None], out0[1][None], out0[2][None]

        loss = jnp.mean(losses)
        return loss, {"loss": loss, "bpp": jnp.mean(bpps),
                      "mse": jnp.mean(mses)}

    def train_step(state, intra_recon, chunks, qp, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, intra_recon, chunks,
                                      qp, rng)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm)
        metrics["grad_norm"] = gnorm
        metrics["skipped"] = ~ok

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_params, state.params)
        new_opt_state = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o) if isinstance(n, jnp.ndarray) else n,
            new_opt_state, state.opt_state)
        return TrainState(params=new_params, opt_state=new_opt_state,
                          step=state.step + 1), metrics

    # expose the forward loss so callers (e.g. the multichip dryrun) can
    # cross-check a sharded train step against a cheap forward-only jit
    # instead of paying a second grad+optimizer compile
    train_step.loss_fn = loss_fn
    return train_step
