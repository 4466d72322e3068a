"""Spatial sharding of the conv grid for very large frames (4K+).

The reference has no tensor parallelism (fully convolutional models,
SURVEY.md 2.5); the TPU-native scale-out analog is sharding H over a
mesh axis: under jit, XLA GSPMD inserts the 1-row halo exchanges that
3x3 convs need as ICI collective-permutes automatically.  Use for
single-frame latency scaling when one chip's FLOPs are the bottleneck.
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharding(mesh, axis="data"):
    """NamedSharding splitting dim 1 (H) of NHWC tensors over `axis`."""
    return NamedSharding(mesh, P(None, axis, None, None))


def shard_spatial(x, mesh, axis="data"):
    return jax.device_put(x, spatial_sharding(mesh, axis))


def run_spatially_sharded(fn, x, mesh, axis="data"):
    """jit fn with H-sharded input and output; params stay replicated."""
    sh = spatial_sharding(mesh, axis)
    return jax.jit(fn, in_shardings=(sh,), out_shardings=sh)(
        jax.device_put(x, sh))
