"""Windowed layout + assembly + model-forward equivalence with the regular
padded batch path (Pallas kernels in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matdeeplearn_tpu.data import BatchSpec, DeviceDataset, assemble_batch
from matdeeplearn_tpu.data.batching import WindowedDeviceData, assemble_batch_windowed
from matdeeplearn_tpu.data.windowed import build_windowed_layout
from matdeeplearn_tpu.models import build_model

TW, TE = 8, 16


@pytest.fixture(scope="module")
def windowed(toy_dataset):
    layout = build_windowed_layout(toy_dataset, tw=TW, te=TE)
    wdata = WindowedDeviceData.from_layout(layout)
    data = DeviceDataset.from_graph_dataset(toy_dataset)
    spec = BatchSpec.for_dataset(
        layout.node_counts_w, layout.wedge_counts, 6, align=TW, align_edges=TE
    )
    return layout, wdata, data, spec


def test_layout_invariants(toy_dataset, windowed):
    layout, _, _, _ = windowed
    ds = toy_dataset
    for g in range(len(ds)):
        a, b = layout.wedge_ptr[g], layout.wedge_ptr[g + 1]
        wd = layout.wdst[a:b]
        wv = layout.wvalid[a:b]
        wo = layout.worder[a:b]
        e0, e1 = ds.edge_ptr[g], ds.edge_ptr[g + 1]
        dst = ds.edge_dst[e0:e1]
        # every real edge exactly once
        assert sorted(wo[wv > 0].tolist()) == list(range(e1 - e0))
        # windowed dst matches the referenced edge's dst
        np.testing.assert_array_equal(wd[wv > 0], dst[wo[wv > 0]])
        # window homogeneity per tile
        t0, t1 = layout.tile_ptr[g], layout.tile_ptr[g + 1]
        for t in range(t1 - t0):
            seg = wd[t * TE : (t + 1) * TE]
            seg = seg[seg >= 0]
            if len(seg):
                assert (seg // TW == layout.tile_window[t0 + t]).all()
    # in_degree matches bincount per graph
    for g in range(min(4, len(ds))):
        e0, e1 = ds.edge_ptr[g], ds.edge_ptr[g + 1]
        n0, n1 = ds.node_ptr[g], ds.node_ptr[g + 1]
        want = np.bincount(ds.edge_dst[e0:e1], minlength=n1 - n0)
        np.testing.assert_array_equal(layout.in_degree[n0:n1], want)


def test_windowed_assembly_consistent(toy_dataset, windowed):
    layout, wdata, data, spec = windowed
    ids = jnp.asarray(np.array([2, 5, 0, 9, -1, -1], np.int32))
    b = jax.jit(
        assemble_batch_windowed, static_argnums=(3, 4, 5)
    )(data, wdata, ids, spec, TW, TE)
    assert b.is_windowed and b.window_size == TW
    # real node count preserved
    nc = toy_dataset.node_counts()
    assert float(b.node_mask.sum()) == nc[[2, 5, 0]].sum() + nc[9]
    # every valid edge's endpoints are valid nodes of the right graph
    em = np.asarray(b.edge_mask) > 0
    src = np.asarray(b.edge_src)[em]
    dst = np.asarray(b.edge_dst)[em]
    nm = np.asarray(b.node_mask)
    assert nm[src].all() and nm[dst].all()
    ng = np.asarray(b.node_graph)
    assert (ng[src] == ng[dst]).all()
    # per-graph edge counts match
    ec = toy_dataset.edge_counts()
    assert em.sum() == ec[[2, 5, 0]].sum() + ec[9]
    # tile windows are homogeneous
    wd = np.asarray(b.edge_dst)
    twid = np.asarray(b.tile_window)
    for t in range(len(twid)):
        seg = wd[t * TE : (t + 1) * TE]
        seg = seg[seg >= 0]
        if len(seg):
            assert (seg // TW == twid[t]).all(), t


@pytest.mark.parametrize("name", ["CGCNN", "GCN", "SchNet", "MPNN", "MEGNet"])
def test_model_forward_matches_regular_path(toy_dataset, windowed, name):
    layout, wdata, data, spec_w = windowed
    ids = np.array([1, 3, 7, 11, 0, 14], np.int32)
    spec_r = BatchSpec.for_dataset(
        toy_dataset.node_counts(), toy_dataset.edge_counts(), 6
    )
    br = assemble_batch(data, jnp.asarray(ids), spec_r)
    bw = assemble_batch_windowed(data, wdata, jnp.asarray(ids), spec_w, TW, TE)

    model = build_model(name, toy_dataset,
                        {"dim1": 12, "dim2": 12, "dim3": 12, "gc_count": 2,
                         "post_fc_count": 1})
    v = model.init(jax.random.PRNGKey(0), br, training=False)
    out_r = model.apply(v, br, training=False)
    out_w = model.apply(v, bw, training=False)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_r),
                               rtol=2e-4, atol=2e-5)


def test_windowed_grads_match(toy_dataset, windowed):
    layout, wdata, data, spec_w = windowed
    ids = np.array([0, 4, 8, 12, 2, 6], np.int32)
    spec_r = BatchSpec.for_dataset(
        toy_dataset.node_counts(), toy_dataset.edge_counts(), 6
    )
    br = assemble_batch(data, jnp.asarray(ids), spec_r)
    bw = assemble_batch_windowed(data, wdata, jnp.asarray(ids), spec_w, TW, TE)
    model = build_model("CGCNN", toy_dataset,
                        {"dim1": 12, "dim2": 12, "gc_count": 2,
                         "post_fc_count": 1, "batch_norm": False})
    v = model.init(jax.random.PRNGKey(1), br, training=False)

    def loss(params, b):
        out = model.apply({"params": params}, b, training=False)
        return jnp.sum(jnp.abs(out - b.y[:, 0]) * b.graph_mask)

    g_r = jax.grad(loss)(v["params"], br)
    g_w = jax.grad(loss)(v["params"], bw)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_r), jax.tree_util.tree_leaves(g_w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-5)


def test_train_regular_with_pallas_kernel(toy_dataset, tmp_path, monkeypatch):
    """End-to-end training with kernel='pallas' (interpret mode on CPU)."""
    monkeypatch.chdir(tmp_path)
    from matdeeplearn_tpu.training import train_regular

    errors = train_regular(
        toy_dataset,
        {"job_name": "w", "seed": 3, "save_model": "False",
         "write_output": "False"},
        {"loss": "l1_loss", "train_ratio": 0.7, "val_ratio": 0.15,
         "test_ratio": 0.15, "verbosity": 0},
        {"model": "CGCNN", "dim1": 10, "dim2": 10, "gc_count": 1,
         "post_fc_count": 1, "epochs": 3, "lr": 0.01, "batch_size": 8,
         "optimizer": "AdamW", "kernel": "pallas", "print_model": False,
         "scheduler": "ReduceLROnPlateau",
         "scheduler_args": {"factor": 0.8, "patience": 10}},
    )
    assert np.isfinite(errors["train"]) and np.isfinite(errors["test"])
