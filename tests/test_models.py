"""Model zoo: forward shapes, jit, and padding-invariance.

Padding-invariance is the load-bearing correctness property of the
static-shape design: adding pad nodes/edges/graphs must not change any real
prediction.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matdeeplearn_tpu.data import BatchSpec, DeviceDataset, assemble_batch
from matdeeplearn_tpu.models import MODEL_REGISTRY, build_model

GNN_NAMES = ["CGCNN", "MPNN", "SchNet", "MEGNet", "GCN"]


def _batch(toy_dataset, batch_size=6, extra_pad=0):
    ds = toy_dataset
    dd = DeviceDataset.from_graph_dataset(ds)
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), batch_size)
    if extra_pad:
        spec = BatchSpec(
            spec.num_graphs + extra_pad,
            spec.num_nodes + 8 * extra_pad,
            spec.num_edges + 8 * extra_pad,
        )
    ids = np.arange(batch_size, dtype=np.int32)
    if extra_pad:
        ids = np.concatenate([ids, np.full(extra_pad, -1, np.int32)])
    return assemble_batch(dd, jnp.asarray(ids), spec)


@pytest.mark.parametrize("name", GNN_NAMES)
def test_forward_shape_and_jit(toy_dataset, name):
    b = _batch(toy_dataset)
    model = build_model(name, toy_dataset, {"dim1": 16, "dim2": 16, "dim3": 16,
                                            "gc_count": 2, "post_fc_count": 1})
    v = model.init(jax.random.PRNGKey(0), b, training=False)
    out = jax.jit(lambda v, b: model.apply(v, b, training=False))(v, b)
    assert out.shape == (b.num_graphs,)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", GNN_NAMES)
def test_padding_invariance(toy_dataset, name):
    model = build_model(name, toy_dataset, {"dim1": 16, "dim2": 16, "dim3": 16,
                                            "gc_count": 2, "post_fc_count": 1})
    b1 = _batch(toy_dataset, 6, extra_pad=0)
    b2 = _batch(toy_dataset, 6, extra_pad=3)
    v = model.init(jax.random.PRNGKey(0), b1, training=False)
    out1 = model.apply(v, b1, training=False)
    out2 = model.apply(v, b2, training=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2)[:6], atol=2e-5)


@pytest.mark.parametrize("name", GNN_NAMES)
@pytest.mark.parametrize("pool", ["global_add_pool", "global_max_pool", "set2set"])
def test_pool_variants(toy_dataset, name, pool):
    if name == "MEGNet" and pool == "global_add_pool":
        pool = "global_sum_pool"  # reference MEGNet maps only sum/mean/max
    model = build_model(name, toy_dataset, {"dim1": 8, "dim2": 8, "dim3": 8,
                                            "gc_count": 1, "post_fc_count": 1,
                                            "pool": pool})
    b = _batch(toy_dataset)
    v = model.init(jax.random.PRNGKey(0), b, training=False)
    out = model.apply(v, b, training=False)
    assert out.shape == (b.num_graphs,)


@pytest.mark.parametrize("name", GNN_NAMES)
def test_late_pool_order(toy_dataset, name):
    model = build_model(name, toy_dataset, {"dim1": 8, "dim2": 8, "dim3": 8,
                                            "gc_count": 1, "post_fc_count": 1,
                                            "pool_order": "late"})
    b = _batch(toy_dataset)
    v = model.init(jax.random.PRNGKey(0), b, training=False)
    out = model.apply(v, b, training=False)
    assert out.shape == (b.num_graphs,)


def test_no_pre_fc(toy_dataset):
    model = build_model("CGCNN", toy_dataset, {"pre_fc_count": 0, "dim1": 8,
                                               "dim2": 8, "gc_count": 1,
                                               "post_fc_count": 0})
    b = _batch(toy_dataset)
    v = model.init(jax.random.PRNGKey(0), b, training=False)
    out = model.apply(v, b, training=False)
    assert out.shape == (b.num_graphs,)


def test_batchnorm_state_updates(toy_dataset):
    model = build_model("CGCNN", toy_dataset, {"dim1": 8, "dim2": 8,
                                               "gc_count": 1, "post_fc_count": 1})
    b = _batch(toy_dataset)
    v = model.init(jax.random.PRNGKey(0), b, training=False)
    assert "batch_stats" in v
    out, mut = model.apply(v, b, training=True, mutable=["batch_stats"])
    before = np.asarray(v["batch_stats"]["bn0"]["mean"])
    after = np.asarray(mut["batch_stats"]["bn0"]["mean"])
    assert not np.allclose(before, after)


def test_descriptor_model(toy_dataset):
    ds = dataclasses.replace(
        toy_dataset,
        extra_features={"SM": np.random.default_rng(0)
                        .standard_normal((len(toy_dataset), 12)).astype(np.float32)},
    )
    dd = DeviceDataset.from_graph_dataset(ds)
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), 4)
    b = assemble_batch(dd, jnp.arange(4, dtype=jnp.int32), spec)
    model = build_model("SM", ds, {"dim1": 8, "fc_count": 2})
    v = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(v, b)
    assert out.shape == (4,)


def test_registry_complete():
    assert set(MODEL_REGISTRY) == {"CGCNN", "MPNN", "SchNet", "MEGNet", "GCN", "SM", "SOAP"}
