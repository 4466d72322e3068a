"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware.

The ambient environment may install an `axon` TPU-tunnel sitecustomize
whose register() pins jax_platforms to the tunneled TPU; env vars set here
would be ignored, so the platform is forced through jax.config (which
wins over the registration) before any backend is touched.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: tiny-codec program compiles dominate the
# suite's wall time; repeated runs (CI, local iteration) reuse them
import tempfile  # noqa: E402

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        tempfile.gettempdir(), f"dcvc_tpu_jax_cache_test_{os.getuid()}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
