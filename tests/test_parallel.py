"""Mesh parallelism tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dcvc_tpu.parallel import make_mesh
from dcvc_tpu.parallel.spatial import run_spatially_sharded, shard_spatial


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_spatial_sharding_matches_single_device(mesh):
    """3x3 conv chain over an H-sharded input must equal the unsharded
    result (GSPMD inserts the halo exchanges)."""
    from dcvc_tpu.layers.blocks import DepthConvBlock

    block = DepthConvBlock(16, 16, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 32, 16)).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x)

    def fn(xx):
        y = block.apply(params, xx)
        return block.apply(params, y)

    want = jax.jit(fn)(x)
    got = run_spatially_sharded(fn, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_data_parallel_grads_match_single_device(mesh):
    """DP train step over the mesh == single-device step on same batch."""
    from dcvc_tpu.models.dmci import DMCI, TINY_CONFIG
    from dcvc_tpu.models.common import get_training_lambdas
    from dcvc_tpu.train import create_train_state, make_image_train_step
    from dcvc_tpu.train.step import make_optimizer

    model = DMCI(cfg=TINY_CONFIG, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (8, 64, 64, 3)).astype(np.float32))
    qp = jnp.arange(8, dtype=jnp.int32) % TINY_CONFIG.qp_num
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda r1, r2: model.init(
        {"params": r1}, x0, jnp.zeros((1,), jnp.int32), r2))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1))["params"]

    tx = make_optimizer(1e-4, 0.1)
    lambdas = get_training_lambdas((0.001, 0.1), TINY_CONFIG.qp_num)
    step = make_image_train_step(model, tx, lambdas)
    state = create_train_state(params, tx)
    key = jax.random.PRNGKey(7)

    # single device
    s1, m1 = jax.jit(step)(state, x, qp, key)

    # sharded over the mesh
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    sharded_step = jax.jit(step, in_shardings=(repl, dsh, dsh, repl),
                           out_shardings=(repl, repl))
    s2, m2 = sharded_step(jax.device_put(state, repl),
                          jax.device_put(x, dsh),
                          jax.device_put(qp, dsh), key)

    # the rate terms are smooth -> tight match; mse passes through
    # ste_round whose boundary flips amplify conv-accumulation-order
    # differences under sharding with random weights -> loose on loss
    np.testing.assert_allclose(float(m1["bpp"]), float(m2["bpp"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=0.1)
    # one AdamW step moves params by <= lr per coord; sharded and
    # unsharded steps must land within a couple of lr of each other
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4)


def test_spatial_sharding_full_model(mesh):
    """DMCI analysis stage with an H-sharded frame."""
    from dcvc_tpu.models.dmci import DMCI, TINY_CONFIG

    model = DMCI(cfg=TINY_CONFIG, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 128, 64, 3)).astype(np.float32))
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda r1, r2: model.init(
        {"params": r1}, x0, jnp.zeros((1,), jnp.int32), r2))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1))["params"]

    def analysis(xx):
        y, z = model.apply({"params": params}, xx, 0, method=DMCI.analysis)
        return y

    want = jax.jit(analysis)(x)
    got = run_spatially_sharded(analysis, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
