"""Multi-chip SPMD step on the 8-device virtual CPU mesh: correctness vs the
single-device step (DP gradient averaging ≡ global weighted-mean loss)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matdeeplearn_tpu.data import BatchSpec, DeviceDataset
from matdeeplearn_tpu.models import build_model
from matdeeplearn_tpu.parallel import make_mesh, make_spmd_eval_step, make_spmd_train_step
from matdeeplearn_tpu.training import train as T
from matdeeplearn_tpu.training.optimizers import build_optimizer


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def _setup(toy_dataset, batch_per_replica=2, model_name="CGCNN"):
    ds = toy_dataset
    data = DeviceDataset.from_graph_dataset(ds)
    spec = BatchSpec.for_dataset(
        ds.node_counts(), ds.edge_counts(), batch_per_replica, align=16
    )
    model = build_model(
        model_name, ds,
        {"dim1": 16, "dim2": 16, "dim3": 16, "gc_count": 2, "post_fc_count": 1},
    )
    tx = build_optimizer("AdamW", 0.01, {})
    ids0 = jnp.arange(batch_per_replica, dtype=jnp.int32)
    sample = T.assemble_batch(data, ids0, spec)
    state = T.init_state(model, tx, sample, 0)
    return ds, data, spec, model, tx, state


def test_spmd_matches_single_device_loss(toy_dataset, eight_devices):
    mesh = make_mesh(dp=4, ep=2, devices=eight_devices)
    ds, data, spec, model, tx, state = _setup(toy_dataset)
    step, ids_sharding, _ = make_spmd_train_step(model, tx, "l1_loss", spec, mesh)

    ids = np.arange(8, dtype=np.int32)
    new_state, loss, count = step(state, data, jnp.asarray(ids), jax.random.PRNGKey(0))
    assert float(count) == 8

    # Exact reference: SPMD runs BN per-replica (spmd.py vmap over dp), so
    # the expected loss is the count-weighted mean of 4 independent
    # single-device train-mode batches of 2 with identical params.
    tstep = T.make_train_step(model, tx, "l1_loss", spec)
    total, csum = 0.0, 0.0
    for r in range(4):
        pair = jnp.asarray(ids[2 * r : 2 * r + 2])
        _, lr_loss, lr_count = tstep(state, data, pair, jax.random.PRNGKey(0))
        total += float(lr_loss) * float(lr_count)
        csum += float(lr_count)
    assert abs(float(loss) - total / csum) < 1e-5


def test_spmd_grads_equal_manual_average(toy_dataset, eight_devices):
    """With BN disabled the spmd step must match the single-device step that
    sees the concatenated batch — exact DDP-averaging semantics."""
    mesh = make_mesh(dp=4, ep=2, devices=eight_devices)
    ds = toy_dataset
    data = DeviceDataset.from_graph_dataset(ds)
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), 2, align=16)
    model = build_model("CGCNN", ds, {"dim1": 16, "dim2": 16, "gc_count": 2,
                                      "post_fc_count": 1, "batch_norm": False})
    tx = build_optimizer("SGD", 0.1, {})
    sample = T.assemble_batch(data, jnp.arange(2, dtype=jnp.int32), spec)
    state = T.init_state(model, tx, sample, 0)

    step, _, _ = make_spmd_train_step(model, tx, "l1_loss", spec, mesh)
    ids = np.arange(8, dtype=np.int32)
    new_state, loss, _ = step(state, data, jnp.asarray(ids), jax.random.PRNGKey(0))

    spec1 = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), 8)
    tstep1 = T.make_train_step(model, tx, "l1_loss", spec1)
    ref_state, ref_loss, _ = tstep1(
        state, data, jnp.arange(8, dtype=jnp.int32), jax.random.PRNGKey(0)
    )
    assert abs(float(loss) - float(ref_loss)) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_spmd_eval_step(toy_dataset, eight_devices):
    mesh = make_mesh(dp=8, ep=1, devices=eight_devices)
    ds, data, spec, model, tx, state = _setup(toy_dataset, batch_per_replica=2)
    estep = make_spmd_eval_step(model, "l1_loss", spec, mesh)
    ids = np.arange(16, dtype=np.int32)
    loss, count, outs = estep(state, data, jnp.asarray(ids))
    assert float(count) == 16
    assert outs.shape == (16,)
    assert np.isfinite(np.asarray(outs)).all()


@pytest.mark.parametrize("name", ["MPNN", "SchNet", "MEGNet", "GCN"])
def test_spmd_all_models_compile(toy_dataset, eight_devices, name):
    mesh = make_mesh(dp=2, ep=4, devices=eight_devices)
    ds, data, spec, model, tx, state = _setup(toy_dataset, 2, name)
    step, _, _ = make_spmd_train_step(model, tx, "l1_loss", spec, mesh)
    ids = np.arange(4, dtype=np.int32)
    new_state, loss, count = step(state, data, jnp.asarray(ids), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
