"""SpyNet optical flow (reference ME_Spynet / MEBasic,
DCVC-family/DCVC/src/models/video_net.py:204-259): 4-level coarse-to-fine
pyramid; each level refines an upsampled flow by a 5-layer conv stack
over [target, warped reference, flow].  The classic family (DCVC, TCM,
HEM) uses 7x7 convs at every level; DC/FM shrink the two finest levels
to 5x5 (DCVC-FM/src/models/video_net.py:47-65 complexity levels)."""

import flax.linen as nn
import jax.numpy as jnp

from .ops import avg_pool_2x, bilinear_upsample_2x, flow_warp


class MEBasic(nn.Module):
    kernel: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        for i, ch in enumerate([32, 64, 32, 16]):
            x = nn.Conv(ch, (k, k), padding=pad,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i+1}")(x)
            x = nn.relu(x)
        return nn.Conv(2, (k, k), padding=pad,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv5")(x)


class MESpynet(nn.Module):
    """im1, im2: (B, H, W, 3) -> flow (B, H, W, 2) warping im2 toward im1.

    level_kernels: per-level conv size, coarsest first (None = all 7x7;
    DC/FM use (7, 7, 5, 5))."""
    levels: int = 4
    level_kernels: tuple = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, im1, im2):
        im1_list = [im1]
        im2_list = [im2]
        for _ in range(self.levels - 1):
            im1_list.append(avg_pool_2x(im1_list[-1]))
            im2_list.append(avg_pool_2x(im2_list[-1]))

        b, h_c, w_c, _ = im2_list[-1].shape
        flow = jnp.zeros((b, h_c // 2, w_c // 2, 2), jnp.float32)
        for level in range(self.levels):
            flow_up = bilinear_upsample_2x(flow) * 2.0
            ref = im1_list[self.levels - 1 - level]
            warped = flow_warp(im2_list[self.levels - 1 - level], flow_up)
            inp = jnp.concatenate(
                [ref, warped, flow_up.astype(ref.dtype)], axis=-1)
            k = (self.level_kernels[level]
                 if self.level_kernels is not None else 7)
            flow = flow_up + MEBasic(kernel=k, dtype=self.dtype,
                                     name=f"moduleBasic_{level}")(inp)
        return flow
