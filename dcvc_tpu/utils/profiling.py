"""Tracing / profiling helpers (SURVEY.md section 5: the reference brackets
encode/decode with CUDA events and relies on static per-(SM, shape) kernel
hint tables; the TPU equivalents are jax.profiler traces + XLA's own
shape-keyed autotuning).
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a TensorBoard-viewable device trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timing with device synchronization — the role of
    the reference's cuda-event brackets (test_video.py:194-264)."""

    def __init__(self):
        self.times = {}

    @contextlib.contextmanager
    def stage(self, name, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self):
        return {name: {"mean_ms": 1000 * sum(v) / len(v), "count": len(v)}
                for name, v in self.times.items()}
