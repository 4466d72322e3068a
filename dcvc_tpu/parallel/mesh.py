"""Device-mesh helpers for SPMD training/eval.

The reference scales by NCCL DDP (1 proc/GPU, src/utils/common.py:190-205);
the TPU-native equivalent is a jax.sharding.Mesh with the batch dim sharded
over the `data` axis: XLA inserts the gradient all-reduce over ICI
automatically when replicated params meet sharded batches under jit.

A `spatial` axis is reserved for sharding the conv grid (H dim) of very
large frames (4K) across chips — halo exchanges become XLA collective
permutes; convs in these codecs are 3x3 max so a 1-row halo suffices.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axes=("data",)):
    """1-D (or n-D) device mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if len(axes) == 1:
        shape = (n_devices,)
    else:
        # fill trailing axes with 1 unless divisible
        shape = (n_devices,) + (1,) * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axes)


def data_sharding(mesh, ndim, batch_axis=0):
    """NamedSharding that shards dim `batch_axis` over the data axis."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())
