"""Quantization primitives with straight-through / bounded gradients.

Re-expresses the reference autograd Functions (QuantFunc / LowerBound,
reference src/layers/layers.py:63-89) as jax.custom_vjp rules.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def ste_round(x):
    """round() with a straight-through gradient (reference QuantFunc)."""
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


@jax.custom_vjp
def lower_bound(x, bound):
    """max(x, bound); gradient passes when x >= bound OR upstream grad < 0.

    Matches reference LowerBound (src/layers/layers.py:63-79): the gradient
    may push x back above the bound but never further below it.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def add_noise(x, rng):
    """Additive U(-0.5, 0.5) noise for training-time rate estimation
    (reference CompressionModel.add_noise, src/models/common_model.py:72-75).
    """
    noise = jax.random.uniform(rng, x.shape, dtype=x.dtype, minval=-0.5, maxval=0.5)
    return x + jax.lax.stop_gradient(noise)
