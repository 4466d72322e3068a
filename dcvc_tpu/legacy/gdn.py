"""Generalized Divisive Normalization (reference GDN,
DCVC-family/DCVC/src/models/video_net.py:29-90): y = x / sqrt(beta +
gamma * x^2) (inverse multiplies), with sqrt-reparameterized bounded
parameters."""

import flax.linen as nn
import jax.numpy as jnp

from ..core.quant import lower_bound


class GDN(nn.Module):
    ch: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    reparam_offset: float = 2 ** -18
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C)."""
        ch = self.ch
        pedestal = self.reparam_offset ** 2
        beta_bound = (self.beta_min + pedestal) ** 0.5
        gamma_bound = self.reparam_offset

        beta = self.param("beta",
                          lambda _: jnp.sqrt(jnp.ones(ch) + pedestal))
        gamma = self.param(
            "gamma",
            lambda _: jnp.sqrt(self.gamma_init * jnp.eye(ch) + pedestal))

        beta = lower_bound(beta, beta_bound) ** 2 - pedestal
        gamma = lower_bound(gamma, gamma_bound) ** 2 - pedestal

        # norm pool: 1x1 conv of x^2 with the (ch, ch) gamma matrix
        x2 = (x.astype(jnp.float32)) ** 2
        norm = jnp.einsum("bhwc,co->bhwo", x2,
                          gamma.astype(jnp.float32).T) + beta
        norm = jnp.sqrt(norm)
        if self.inverse:
            out = x.astype(jnp.float32) * norm
        else:
            out = x.astype(jnp.float32) / norm
        return out.astype(x.dtype)
