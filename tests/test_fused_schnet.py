"""Fused SchNet cfconv Pallas kernel (ops/pallas_fused_schnet.py) — fwd/bwd
parity against the pure-XLA composition and end-to-end kernel=fused
training parity (VERDICT r3 next #5: extend the fused-kernel design to a
second conv family)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matdeeplearn_tpu.ops import pallas_fused_schnet as PFS
from matdeeplearn_tpu.ops.pallas_segment import WindowedEdges
from matdeeplearn_tpu.training import jobs as J
from matdeeplearn_tpu.training import train as T

from tests.test_fused_cgconv import _windowed_batch


def _params(key, f, de):
    ks = jax.random.split(key, 4)
    sc = 0.4
    return (
        sc * jax.random.normal(ks[0], (de, f)),
        sc * jax.random.normal(ks[1], (1, f)),
        sc * jax.random.normal(ks[2], (f, f)),
        sc * jax.random.normal(ks[3], (1, f)),
    )


def _setup_op(toy_dataset, f=16, de=20, width=0.2, cutoff=5.0):
    batch, tw, te = _windowed_batch(toy_dataset)
    key = jax.random.PRNGKey(0)
    xj = jax.random.normal(key, (batch.num_edges, f)) \
        * batch.edge_mask[:, None]
    params = _params(jax.random.PRNGKey(1), f, de)
    we = WindowedEdges(order=batch.edge_dst, dst=batch.edge_dst,
                       window_id=batch.tile_window,
                       first_tile=batch.tile_first, valid=batch.edge_mask)
    cfg = (batch.num_nodes, tw, te, de, width, cutoff, True, True)
    return batch, xj, we, params, cfg, de, width, cutoff


def test_fused_cfconv_forward_matches_xla(toy_dataset):
    batch, xj, we, params, cfg, de, width, cutoff = _setup_op(toy_dataset)
    out = PFS.fused_cfconv(cfg, xj, batch.edge_dist_norm,
                           batch.edge_weight, we, *params)
    ref = PFS._reference_compose(xj, batch.edge_dist_norm,
                                 batch.edge_weight, we, params,
                                 batch.num_nodes, de, width, cutoff)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_cfconv_backward_matches_xla(toy_dataset):
    batch, xj, we, params, cfg, de, width, cutoff = _setup_op(toy_dataset)
    cot = jax.random.normal(jax.random.PRNGKey(3),
                            (batch.num_nodes, xj.shape[1]))

    def f_fused(xj_, *p):
        out = PFS.fused_cfconv(cfg, xj_, batch.edge_dist_norm,
                               batch.edge_weight, we, *p)
        return jnp.sum(out * cot)

    def f_ref(xj_, *p):
        out = PFS._reference_compose(xj_, batch.edge_dist_norm,
                                     batch.edge_weight, we, p,
                                     batch.num_nodes, de, width, cutoff)
        return jnp.sum(out * cot)

    gf = jax.grad(f_fused, argnums=tuple(range(5)))(xj, *params)
    gr = jax.grad(f_ref, argnums=tuple(range(5)))(xj, *params)
    names = ["xj", "w0", "b0", "w1", "b1"]
    for name, a, b in zip(names, gr, gf):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5 * scale,
                                   err_msg=f"grad mismatch for {name}")


def test_fused_schnet_training_matches_xla(toy_dataset):
    """kernel=fused end-to-end on SchNet: identical parameter tree
    (checkpoint compat) and a final error matching kernel=xla within
    interpret-mode numerics."""
    runs = {}
    # Compare against kernel=pallas: identical windowed batches and edge
    # order, so the ONLY difference is the fused cfconv kernel (xla/padded
    # differs additionally by batch layout and f32 reduction order, which
    # compounds over epochs).
    for kern in ("fused", "pallas"):
        mp = {"model": "SchNet", "dim1": 16, "dim2": 16, "dim3": 16,
              "gc_count": 2, "post_fc_count": 1, "batch_size": 8,
              "epochs": 5, "lr": 0.01, "optimizer": "AdamW",
              "scheduler": "ReduceLROnPlateau", "kernel": kern,
              "cutoff": 5.0, "batch_norm": "True"}
        run = J.setup_run(toy_dataset, mp, "l1_loss", seed=0,
                          print_model=False)
        if kern == "fused":
            assert run.kernel_mode == "fused"
        idx = np.arange(len(toy_dataset))
        _, last, _ = J.run_fused_training(
            run, train_idx=idx[:10], val_idx=idx[10:], epochs=5,
            verbosity=5, seed=0,
        )
        err = T.evaluate_scan(run.eval_epoch_fn, last, run.data, idx[:10],
                              run.global_batch,
                              id_matrix_fn=run.id_matrix_fn)
        runs[kern] = (last, err)

    pf = runs["fused"][0].params
    px = runs["pallas"][0].params
    fl = jax.tree_util.tree_leaves_with_path(pf)
    xl = jax.tree_util.tree_leaves_with_path(px)
    assert [p for p, _ in fl] == [p for p, _ in xl], "param trees differ"
    assert np.isfinite(runs["fused"][1])
    np.testing.assert_allclose(runs["fused"][1], runs["pallas"][1],
                               rtol=2e-3, atol=2e-3)


def test_fused_schnet_packed(toy_dataset):
    """fused cfconv over packed windowed bins (the composed production
    configuration) — eval parity with the padded XLA path."""
    mp = {"model": "SchNet", "dim1": 16, "dim2": 16, "dim3": 16,
          "gc_count": 1, "post_fc_count": 1, "batch_size": 6, "lr": 0.01,
          "cutoff": 5.0, "print_model": False, "batch_norm": "True"}
    run_x = J.setup_run(toy_dataset, {**mp, "kernel": "xla"}, "l1_loss",
                        seed=2)
    run_fp = J.setup_run(
        toy_dataset, {**mp, "kernel": "fused", "batching": "packed"},
        "l1_loss", seed=2,
    )
    run_fp.state = run_x.state
    idx = np.arange(len(toy_dataset))
    _, p_x, _ = T.evaluate_scan(
        run_x.eval_epoch_fn, run_x.state, run_x.data, idx,
        run_x.global_batch, out=True,
    )
    _, p_fp, _ = T.evaluate_scan(
        run_fp.eval_epoch_fn, run_fp.state, run_fp.data, idx,
        run_fp.global_batch, out=True, id_matrix_fn=run_fp.id_matrix_fn,
    )
    np.testing.assert_allclose(p_x, p_fp, rtol=2e-4, atol=2e-5)
