"""Data-parallel SPMD tests over the virtual 8-device CPU mesh — the CI
coverage the reference lacks entirely (its DDP test is hardware-gated,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgeyolo_tpu.parallel.mesh import batch_sharding, get_mesh, replicated, shard_batch


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return get_mesh(8)


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_batch_sharded_over_data_axis(mesh):
    x = np.zeros((16, 8, 8, 3), np.float32)
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    # each device holds 16/8 = 2 examples
    shard = xs.addressable_shards[0]
    assert shard.data.shape[0] == 2


def test_psum_gradient_semantics(mesh):
    """Replicated params + sharded batch: grads computed under jit equal the
    full-batch gradient (XLA inserts the reduction)."""
    w = jax.device_put(jnp.ones((4,)), replicated(mesh))
    x = np.arange(32 * 4, dtype=np.float32).reshape(32, 4) / 100.0
    xs = jax.device_put(x, batch_sharding(mesh))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_sharded = jax.jit(jax.grad(loss))(w, xs)
    g_local = jax.grad(loss)(jnp.ones((4,)), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_local), rtol=1e-5)


def test_full_train_step_on_mesh():
    """The driver's dryrun contract: full training step over 8 devices."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_shard_batch_keeps_meta(mesh):
    b = {"img": np.zeros((8, 4, 4, 3)), "meta": ["x"] * 8, "n_real": 8}
    sb = shard_batch(b, mesh)
    assert sb["meta"] == ["x"] * 8 and sb["n_real"] == 8
    assert len(sb["img"].sharding.device_set) == 8
