"""DCVC-TPU: a TPU-native neural video codec framework.

A ground-up JAX/XLA/Pallas re-design of the DCVC family of neural video
codecs (DCVC ... DCVC-UF, reference: microsoft/DCVC).  The compute path is
NHWC bf16 JAX compiled by XLA onto the MXU; the entropy-coding backend is a
multithreaded host-side C++ rANS coder behind a clean device->host int8/int16
latent boundary; training scales over TPU meshes with jax.sharding.
"""

__version__ = "0.1.0"
