"""Complexity counter + stage timer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dcvc_tpu.utils.model_complexity import cost_analysis, count_macs
from dcvc_tpu.utils.profiling import StageTimer


def test_matmul_macs():
    a = jnp.zeros((128, 256), jnp.float32)
    b = jnp.zeros((256, 64), jnp.float32)
    macs = count_macs(lambda x, y: x @ y, a, b)
    # 128*256*64 MACs
    assert abs(macs - 128 * 256 * 64) / (128 * 256 * 64) < 0.05


def test_model_complexity_runs():
    from dcvc_tpu.models.dmci import DMCI, TINY_CONFIG
    from dcvc_tpu.utils.model_complexity import model_macs_per_pixel
    model = DMCI(cfg=TINY_CONFIG, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda r1, r2: model.init({"params": r1}, x, 0, r2))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1))["params"]
    kmacs = model_macs_per_pixel(model, params, 64, 64)
    assert kmacs > 0


def test_stage_timer():
    t = StageTimer()
    x = jnp.ones((64, 64))
    with t.stage("mul", sync=None):
        y = x * 2
    with t.stage("mul", sync=y):
        y = y * 2
    s = t.summary()
    assert s["mul"]["count"] == 2
    assert s["mul"]["mean_ms"] >= 0
