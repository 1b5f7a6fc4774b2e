"""Device batch assembly vs a straightforward host-side reference."""

import jax
import jax.numpy as jnp
import numpy as np

from matdeeplearn_tpu.data import (
    BatchSpec,
    DeviceDataset,
    assemble_batch,
    batch_iterator,
)


def _host_assemble(ds, ids):
    """Naive numpy collation (PyG Batch-style) for cross-checking."""
    xs, srcs, dsts, ws, ds_norm, graph = [], [], [], [], [], []
    off = 0
    for g, i in enumerate(ids):
        if i < 0:
            continue
        n0, n1 = ds.node_ptr[i], ds.node_ptr[i + 1]
        e0, e1 = ds.edge_ptr[i], ds.edge_ptr[i + 1]
        xs.append(ds.node_x[n0:n1])
        srcs.append(ds.edge_src[e0:e1] + off)
        dsts.append(ds.edge_dst[e0:e1] + off)
        ws.append(ds.edge_weight[e0:e1])
        ds_norm.append(ds.edge_dist_norm[e0:e1])
        graph.extend([g] * (n1 - n0))
        off += n1 - n0
    return (
        np.concatenate(xs),
        np.concatenate(srcs),
        np.concatenate(dsts),
        np.concatenate(ws),
        np.concatenate(ds_norm),
        np.array(graph),
    )


def test_assemble_matches_host(toy_dataset):
    ds = toy_dataset
    dd = DeviceDataset.from_graph_dataset(ds)
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), 5)
    ids = np.array([3, 0, 7, 12, 9], np.int32)
    b = jax.jit(assemble_batch, static_argnums=2)(dd, jnp.asarray(ids), spec)

    x, src, dst, w, dn, graph = _host_assemble(ds, ids)
    n = len(x)
    e = len(src)
    assert float(b.node_mask.sum()) == n
    assert float(b.edge_mask.sum()) == e
    np.testing.assert_allclose(np.asarray(b.x)[:n], x, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(b.edge_src)[:e], src)
    np.testing.assert_array_equal(np.asarray(b.edge_dst)[:e], dst)
    np.testing.assert_allclose(np.asarray(b.edge_weight)[:e], w, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b.edge_dist_norm)[:e], dn, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(b.node_graph)[:n], graph)
    # pad nodes land in the dummy segment
    assert (np.asarray(b.node_graph)[n:] == b.num_graphs).all()
    np.testing.assert_allclose(
        np.asarray(b.y).ravel(), ds.targets[ids], rtol=1e-6
    )


def test_assemble_with_pad_graphs(toy_dataset):
    ds = toy_dataset
    dd = DeviceDataset.from_graph_dataset(ds)
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), 4)
    ids = np.array([5, 2, -1, -1], np.int32)
    b = assemble_batch(dd, jnp.asarray(ids), spec)
    assert list(np.asarray(b.graph_mask)) == [1, 1, 0, 0]
    n = ds.node_counts()[5] + ds.node_counts()[2]
    assert float(b.node_mask.sum()) == n
    assert float(b.y[2, 0]) == 0.0  # masked target zeroed


def test_batch_iterator_covers_all():
    seen = []
    for ids in batch_iterator(10, 4, shuffle=True, seed=1):
        assert len(ids) == 4
        seen.extend([i for i in ids if i >= 0])
    assert sorted(seen) == list(range(10))


def test_spec_upper_bound(toy_dataset):
    ds = toy_dataset
    nc, ec = ds.node_counts(), ds.edge_counts()
    spec = BatchSpec.for_dataset(nc, ec, 6)
    worst_n = np.sort(nc)[-6:].sum()
    assert spec.num_nodes >= worst_n
    assert spec.num_nodes % 8 == 0


def test_slot_to_graph_matches_searchsorted():
    """_slot_to_graph (scatter+cumsum) ≡ searchsorted(cum, arange, 'right')
    — the assembly fast path's correctness contract, incl. edge cases
    (empty graphs, cum values at/above the slot count)."""
    import jax.numpy as jnp
    import numpy as np

    from matdeeplearn_tpu.data.batching import _slot_to_graph

    rng = np.random.default_rng(0)
    for _ in range(20):
        b = int(rng.integers(1, 12))
        counts = rng.integers(0, 9, size=b)  # zeros = empty graphs
        cum = np.cumsum(counts)
        n_slots = int(rng.integers(1, cum[-1] + 8))
        want = np.searchsorted(cum, np.arange(n_slots), side="right")
        got = np.asarray(_slot_to_graph(jnp.asarray(cum, jnp.int32), n_slots))
        np.testing.assert_array_equal(got, want)
