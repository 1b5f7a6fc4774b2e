"""CSR (dst-sorted) Pallas segment-reduce/gather: op parity, layout
fallback, and end-to-end model parity (kernel: csr vs xla).

The kernels run in interpret mode on CPU (exact single-pass HIGHEST
matmuls); on TPU they compile to the windowed one-hot MXU form with the
hilo split (see ops/pallas_csr.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from matdeeplearn_tpu.ops.pallas_csr import sorted_gather, sorted_segment_sum


def _sorted_problem(rng, n_real=150, n=256, d=24, pad_to=1152):
    """Hole-free sorted dst (self-loop invariant) + tail pads."""
    deg = rng.integers(1, 9, n_real)
    dst = np.repeat(np.arange(n_real), deg).astype(np.int32)
    e_real = len(dst)
    assert e_real < pad_to
    dstp = np.concatenate([dst, np.zeros(pad_to - e_real, np.int32)])
    mask = np.zeros(pad_to, np.float32)
    mask[:e_real] = 1.0
    msg = rng.standard_normal((pad_to, d)).astype(np.float32)
    return dstp, mask, msg, e_real, n


def test_sorted_segment_sum_parity():
    rng = np.random.default_rng(0)
    dstp, mask, msg, e_real, n = _sorted_problem(rng)
    mj, dj, kj = jnp.asarray(msg), jnp.asarray(dstp), jnp.asarray(mask)
    ref = jax.ops.segment_sum(mj * kj[:, None], dj, num_segments=n)
    cot = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    gr = np.asarray(cot)[np.minimum(dstp, n - 1)] * mask[:, None]
    for te in (128, 256):
        out = sorted_segment_sum(mj, dj, kj, n, te, True, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        g = jax.grad(lambda m: jnp.sum(
            sorted_segment_sum(m, dj, kj, n, te, True, True) * cot))(mj)
        np.testing.assert_allclose(np.asarray(g), gr, rtol=1e-5, atol=1e-5)
    # mask=None (all edges real)
    out = sorted_segment_sum(mj[:e_real], dj[:e_real], None, n, 128, True,
                             True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sorted_segment_sum_unsorted_fallback():
    """The layout contract is verified on device: unsorted dst must take
    the lax.cond XLA fallback and stay exact (fwd AND bwd)."""
    rng = np.random.default_rng(1)
    dstp, mask, msg, e_real, n = _sorted_problem(rng)
    perm = rng.permutation(e_real)
    dstp[:e_real] = dstp[:e_real][perm]
    mj, dj, kj = jnp.asarray(msg), jnp.asarray(dstp), jnp.asarray(mask)
    ref = jax.ops.segment_sum(mj * kj[:, None], dj, num_segments=n)
    out = sorted_segment_sum(mj, dj, kj, n, 128, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    cot = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    g = jax.grad(lambda m: jnp.sum(
        sorted_segment_sum(m, dj, kj, n, 128, True, True) * cot))(mj)
    gr = np.asarray(cot)[np.minimum(dstp, n - 1)] * mask[:, None]
    np.testing.assert_allclose(np.asarray(g), gr, rtol=1e-6, atol=1e-6)


def test_sorted_gather_parity():
    rng = np.random.default_rng(2)
    dstp, mask, _, e_real, n = _sorted_problem(rng)
    x = jnp.asarray(rng.standard_normal((n, 24)), jnp.float32)
    dj, kj = jnp.asarray(dstp), jnp.asarray(mask)
    ref = np.asarray(x)[np.minimum(dstp, n - 1)] * mask[:, None]
    out = sorted_gather(x, dj, kj, n, 128, True, True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    # VJP: d_x = scatter-add of the cotangent at dst
    cot = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
    g = jax.grad(lambda xv: jnp.sum(
        sorted_gather(xv, dj, kj, n, 128, True, True) * cot))(x)
    gr = jax.ops.segment_sum(cot * kj[:, None], dj, num_segments=n)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)


def test_csr_batch_assembly_sorted(toy_dataset):
    """dst_sorted DeviceDataset ⇒ assembled batch edge_dst non-decreasing
    over real edges, and in_degree is populated and exact."""
    from matdeeplearn_tpu.data.batching import (
        BatchSpec,
        DeviceDataset,
        assemble_batch,
    )

    ds = toy_dataset
    dd = DeviceDataset.from_graph_dataset(ds, edge_order="dst")
    assert dd.dst_sorted
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), 8)
    b = assemble_batch(dd, jnp.arange(8, dtype=jnp.int32), spec)
    assert b.dst_sorted and b.in_degree is not None
    dst = np.asarray(b.edge_dst)
    m = np.asarray(b.edge_mask) > 0
    real = dst[m]
    assert np.all(np.diff(real) >= 0), "batch edge_dst not sorted"
    deg = np.zeros(b.num_nodes)
    np.add.at(deg, real, 1.0)
    np.testing.assert_allclose(np.asarray(b.in_degree), deg)


def test_csr_model_parity(toy_dataset):
    """CGCNN + GCN forward/grads with the dst-sorted layout + CSR kernels
    match the reference-order XLA path (same params; fp-reorder
    tolerance)."""
    from matdeeplearn_tpu.data.batching import (
        BatchSpec,
        DeviceDataset,
        assemble_batch,
    )
    from matdeeplearn_tpu.models import build_model
    from matdeeplearn_tpu.training import train as T
    from matdeeplearn_tpu.training.optimizers import build_optimizer

    ds = toy_dataset
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), 8)
    ids = jnp.arange(8, dtype=jnp.int32)
    b_ref = assemble_batch(DeviceDataset.from_graph_dataset(ds), ids, spec)
    b_csr = assemble_batch(
        DeviceDataset.from_graph_dataset(ds, edge_order="dst"), ids, spec)
    for name, params in (
        ("CGCNN", {"dim1": 12, "dim2": 10, "gc_count": 2, "batch_norm": True}),
        ("GCN", {"dim1": 12, "dim2": 10, "gc_count": 2, "batch_norm": True}),
        ("MPNN", {"dim1": 10, "dim2": 10, "dim3": 8, "gc_count": 1,
                  "batch_norm": False}),
    ):
        model = build_model(name, ds, params)
        tx = build_optimizer("SGD", 0.1, {})
        state = T.init_state(model, tx, b_ref, 0)
        vars_ = {"params": state.params, "batch_stats": state.batch_stats}
        out_ref = model.apply(vars_, b_ref, training=False)
        out_csr = model.apply(vars_, b_csr, training=False)
        np.testing.assert_allclose(
            np.asarray(out_ref), np.asarray(out_csr), rtol=2e-4, atol=2e-4,
            err_msg=f"{name} fwd")

        def loss_of(p, b):
            out = model.apply(
                {"params": p, "batch_stats": state.batch_stats}, b,
                training=False)
            return jnp.sum(jnp.abs(out) * b.graph_mask)

        g_ref = jax.grad(loss_of)(state.params, b_ref)
        g_csr = jax.grad(loss_of)(state.params, b_csr)
        flat_r = jax.tree_util.tree_leaves(g_ref)
        flat_c = jax.tree_util.tree_leaves(g_csr)
        for r, c in zip(flat_r, flat_c):
            sc = max(float(jnp.abs(r).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(r), rtol=5e-4, atol=5e-4 * sc,
                err_msg=f"{name} grads")


def test_csr_job_end_to_end(toy_dataset, tmp_path, monkeypatch):
    """kernel=csr trains through the job layer (loss decreases, kernel_mode
    recorded)."""
    import os

    from matdeeplearn_tpu.training import jobs as J

    monkeypatch.chdir(tmp_path)
    mp = {"model": "CGCNN", "dim1": 10, "dim2": 8, "gc_count": 2,
          "batch_size": 8, "epochs": 3, "kernel": "csr", "lr": 0.005,
          "verbosity": 1}
    run = J.setup_run(toy_dataset, mp, "l1_loss", seed=0)
    assert run.kernel_mode == "csr"
    result = J.train_regular(
        toy_dataset,
        job_parameters={"load_model": "False", "save_model": "False",
                        "write_output": "False", "parallel": "False",
                        "seed": 0},
        training_parameters={"loss": "l1_loss", "train_ratio": 0.7,
                             "val_ratio": 0.15, "test_ratio": 0.15,
                             "verbosity": 1, "target_index": 0},
        model_parameters=mp,
    )
    assert result is not None


def test_csr_pool_parity(toy_dataset):
    """node→graph pooling over the CSR kernel (node_graph is sorted in
    every batch — no layout opt-in): kernel path vs masked XLA ops, fwd
    and grad, including the ones-column count trick for mean."""
    from matdeeplearn_tpu.data.batching import (
        BatchSpec,
        DeviceDataset,
        assemble_batch,
    )
    from matdeeplearn_tpu.ops import segment
    from matdeeplearn_tpu.ops.pallas_csr import sorted_segment_sum

    ds = toy_dataset
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), 8)
    b = assemble_batch(DeviceDataset.from_graph_dataset(ds),
                       jnp.arange(8, dtype=jnp.int32), spec)
    B = b.num_graphs
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b.num_nodes, 24)), jnp.float32)
    # mean via the ones-column trick, kernel forced in interpret mode
    xx = jnp.concatenate([x, jnp.ones((x.shape[0], 1), jnp.float32)], -1)
    out = sorted_segment_sum(xx, b.node_graph, b.node_mask, B + 1,
                             256, True, True)
    s, c = out[:B, :24], out[:B, 24]
    mean_k = s / jnp.maximum(c, 1.0)[:, None]
    mean_ref = segment.segment_mean(
        x, b.node_graph, num_segments=B + 1, mask=b.node_mask)[:B]
    np.testing.assert_allclose(np.asarray(mean_k), np.asarray(mean_ref),
                               rtol=1e-5, atol=1e-5)
    # grads through the kernel's VJP match the XLA pool's
    cot = jnp.asarray(rng.standard_normal((B, 24)), jnp.float32)

    def via_kernel(xv):
        xxv = jnp.concatenate(
            [xv, jnp.ones((xv.shape[0], 1), jnp.float32)], -1)
        o = sorted_segment_sum(xxv, b.node_graph, b.node_mask, B + 1,
                               256, True, True)
        return jnp.sum(o[:B, :24] / jnp.maximum(o[:B, 24], 1.0)[:, None]
                       * cot)

    def via_xla(xv):
        return jnp.sum(segment.segment_mean(
            xv, b.node_graph, num_segments=B + 1,
            mask=b.node_mask)[:B] * cot)

    gk = jax.grad(via_kernel)(x)
    gr = jax.grad(via_xla)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)


def test_csr_src_order_megnet_parity(toy_dataset):
    """MEGNet with the src-sorted layout (its csr order: edge→node means,
    x[src] gathers and u broadcasts ride the CSR kernels) matches the
    reference-order path, fwd + grads."""
    from matdeeplearn_tpu.data.batching import (
        BatchSpec,
        DeviceDataset,
        assemble_batch,
    )
    from matdeeplearn_tpu.models import build_model
    from matdeeplearn_tpu.training import train as T
    from matdeeplearn_tpu.training.optimizers import build_optimizer

    ds = toy_dataset
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), 8)
    ids = jnp.arange(8, dtype=jnp.int32)
    b_ref = assemble_batch(DeviceDataset.from_graph_dataset(ds), ids, spec)
    dd_src = DeviceDataset.from_graph_dataset(ds, edge_order="src")
    assert dd_src.src_sorted and not dd_src.dst_sorted
    b_src = assemble_batch(dd_src, ids, spec)
    assert b_src.src_sorted and b_src.in_degree is not None
    src = np.asarray(b_src.edge_src)[np.asarray(b_src.edge_mask) > 0]
    assert np.all(np.diff(src) >= 0), "batch edge_src not sorted"
    # in_degree holds the OUT-degree under src order
    outdeg = np.zeros(b_src.num_nodes)
    np.add.at(outdeg, src, 1.0)
    np.testing.assert_allclose(np.asarray(b_src.in_degree), outdeg)

    model = build_model("MEGNet", ds, {"dim1": 12, "dim2": 12, "dim3": 12,
                                       "gc_fc_count": 1, "gc_count": 2})
    tx = build_optimizer("SGD", 0.1, {})
    state = T.init_state(model, tx, b_ref, 0)
    vars_ = {"params": state.params, "batch_stats": state.batch_stats}
    out_ref = model.apply(vars_, b_ref, training=False)
    out_src = model.apply(vars_, b_src, training=False)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_src),
                               rtol=2e-4, atol=2e-4)

    def loss_of(p, b):
        out = model.apply({"params": p, "batch_stats": state.batch_stats},
                          b, training=False)
        return jnp.sum(jnp.abs(out) * b.graph_mask)

    g_ref = jax.grad(loss_of)(state.params, b_ref)
    g_src = jax.grad(loss_of)(state.params, b_src)
    for r, c in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_src)):
        sc = max(float(jnp.abs(r).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(c), np.asarray(r),
                                   rtol=5e-4, atol=5e-4 * sc)
