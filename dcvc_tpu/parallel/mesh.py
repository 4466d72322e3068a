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


def make_mesh(n_devices=None, axes=("data",), shape=None):
    """1-D (or n-D) device mesh over the first n_devices devices.

    For multi-axis meshes pass ``shape`` explicitly (e.g. ``(2, 4)`` for
    ``axes=("data", "spatial")``); it must multiply out to ``n_devices``.
    Without ``shape``, all devices go on the first axis and trailing axes
    get extent 1.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"mesh needs {n_devices} devices, platform has {len(devices)}")
    devices = np.asarray(devices[:n_devices])
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axes) - 1)
    if len(shape) != len(axes):
        raise ValueError(f"shape {shape} does not match axes {axes}")
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"shape {shape} does not cover {n_devices} devices")
    return Mesh(devices.reshape(shape), axes)


def data_sharding(mesh, ndim, batch_axis=0):
    """NamedSharding that shards dim `batch_axis` over the data axis."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())
