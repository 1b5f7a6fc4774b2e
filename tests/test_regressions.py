"""Regression tests for round-1 verdict findings: NaN val errors must never
become the best model (fused + host trainer paths), and ensemble averaging
must handle multi-output targets."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from matdeeplearn_tpu.training import train as T
from matdeeplearn_tpu.training.fused import FusedCarry, make_fused_epochs_fn, plateau_init
from matdeeplearn_tpu.training.optimizers import build_optimizer


def _tiny_state(lr=0.01):
    params = {"w": jnp.zeros((1,))}
    tx = build_optimizer("SGD", lr, {})
    return T.TrainState(
        params=params, batch_stats={}, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def test_fused_nan_val_never_becomes_best():
    """Epoch 1 val=0.5 (improves); epoch 2+ val=NaN → best must stay at the
    epoch-1 params, not track the diverged state."""

    def train_body(state, data, ids_row, rng):
        new = state.replace(
            params={"w": state.params["w"] + 1.0}, step=state.step + 1
        )
        return new, jnp.asarray(1.0), jnp.asarray(1.0)

    def eval_body(state, data, ids_row):
        val = jnp.where(state.step >= 2, jnp.nan, 0.5)
        return val, jnp.asarray(1.0), jnp.zeros((1,))

    fused = make_fused_epochs_fn(
        train_body, eval_body, has_val=True,
        scheduler_kwargs=dict(factor=0.8, patience=10, threshold=1e-4,
                              min_lr=0.0),
    )
    state = _tiny_state()
    carry = FusedCarry(
        state=state, sched=plateau_init(0.01),
        best_val=jnp.asarray(jnp.inf, jnp.float32),
        best_params=state.params, best_stats=state.batch_stats,
        rng=jax.random.PRNGKey(0),
    )
    ids = jnp.zeros((3, 1, 1), jnp.int32)  # 3 epochs, 1 step each
    vids = jnp.zeros((1, 1), jnp.int32)
    carry, metrics = fused(carry, None, ids, vids)
    assert float(carry.best_val) == 0.5
    # best params are from after epoch 1 (w=1), not the last state (w=3)
    np.testing.assert_allclose(np.asarray(carry.best_params["w"]), [1.0])
    np.testing.assert_allclose(np.asarray(carry.state.params["w"]), [3.0])
    assert np.isnan(np.asarray(metrics["val_error"][1:])).all()


def test_trainer_nan_val_never_becomes_best():
    from matdeeplearn_tpu.training.scheduler import build_scheduler

    calls = {"n": 0}

    def train_epoch_fn(state, data, ids, rng):
        new = state.replace(
            params={"w": state.params["w"] + 1.0}, step=state.step + 1
        )
        return new, jnp.asarray(1.0)

    def eval_epoch_fn(state, data, ids):
        calls["n"] += 1
        step = int(state.step)
        val = float("nan") if step >= 2 else 0.5
        return jnp.asarray(val), jnp.zeros((1, 1))

    state = _tiny_state()
    sched = build_scheduler("ReduceLROnPlateau", 0.01, {"patience": 10})
    best, last = T.trainer(
        train_epoch_fn=train_epoch_fn, eval_epoch_fn=eval_epoch_fn,
        state=state, scheduler=sched, data=None,
        train_idx=np.arange(2), val_idx=np.arange(1), batch_size=2,
        epochs=3, verbosity=0, rng_key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(best.params["w"]), [1.0])
    np.testing.assert_allclose(np.asarray(last.params["w"]), [3.0])


def _multi_target_dataset(tmp_path, n=14):
    from matdeeplearn_tpu.data import get_dataset

    rng = np.random.default_rng(3)
    root = tmp_path / "multi_out"
    root.mkdir()
    rows = []
    for i in range(n):
        na = int(rng.integers(3, 7))
        doc = {
            "1": {
                "cell": {"array": {"__ndarray__": [[3, 3], "float64",
                                                   (np.eye(3) * 6.0).ravel().tolist()]}},
                "numbers": {"__ndarray__": [[na], "int64",
                                            rng.integers(1, 20, na).tolist()]},
                "pbc": {"__ndarray__": [[3], "bool", [True] * 3]},
                "positions": {"__ndarray__": [[na, 3], "float64",
                                              (rng.random((na, 3)) * 6).ravel().tolist()]},
            }
        }
        (root / f"{i}.json").write_text(json.dumps(doc))
        rows.append(f"{i},{rng.normal():.5f},{rng.normal():.5f}")
    (root / "targets.csv").write_text("\n".join(rows) + "\n")
    return get_dataset(
        str(root), target_index=-1,
        processing_args={"graph_max_radius": 5.0, "graph_max_neighbors": 6,
                         "verbose": "False"},
    )


def test_ensemble_multi_output(tmp_path, monkeypatch):
    from matdeeplearn_tpu.training import train_ensemble

    ds = _multi_target_dataset(tmp_path)
    assert ds.output_dim == 2
    monkeypatch.chdir(tmp_path)
    mp = {"model": "CGCNN", "dim1": 8, "dim2": 8, "gc_count": 1,
          "post_fc_count": 1, "epochs": 2, "lr": 0.01, "batch_size": 8,
          "optimizer": "AdamW", "scheduler": "ReduceLROnPlateau",
          "scheduler_args": {"factor": 0.8, "patience": 10},
          "print_model": False}
    tp = {"loss": "l1_loss", "train_ratio": 0.7, "val_ratio": 0.15,
          "test_ratio": 0.15, "verbosity": 0}
    err = train_ensemble(
        ds,
        {"job_name": "mens", "ensemble_list": "A,B", "seed": 11,
         "model_path": "m.ckpt", "write_output": "Partial",
         "save_model": "False"},
        tp, {"A": mp, "B": {**mp, "dim1": 10}},
    )
    assert np.isfinite(err)
    lines = (tmp_path / "mens_test_ensemble_outputs.csv").read_text().splitlines()
    header = lines[0].split(",")
    # ids + 2 targets + 2 models x 2 outputs + 2 ensemble columns
    assert header == ["ids", "target_0", "target_1", "A_0", "A_1",
                      "B_0", "B_1", "ensemble_0", "ensemble_1"]
    row = lines[1].split(",")
    assert len(row) == 9
    # ensemble columns are the mean of the per-model predictions
    np.testing.assert_allclose(
        float(row[7]), (float(row[3]) + float(row[5])) / 2, rtol=1e-5
    )
    # Partial removed the per-model split outputs (reference
    # training.py:1190-1196)
    assert not (tmp_path / "mens_0_A_test_outputs.csv").exists()


def test_fused_trainer_max_dispatch_chunk_cap(toy_dataset, monkeypatch):
    """MDL_MAX_DISPATCH_S shrinks chunk length after the first dispatch so
    no single fused dispatch exceeds the budget (the r4 diagnosis of the
    r3 padded-xla-46k crash: >60 s dispatches killed by the tunneled TPU
    worker). Chunking never changes semantics — same final errors."""
    import numpy as np

    from matdeeplearn_tpu.training import jobs as J

    mp = {"model": "CGCNN", "dim1": 8, "dim2": 8, "gc_count": 1,
          "post_fc_count": 1, "batch_size": 8, "epochs": 6, "lr": 0.01,
          "optimizer": "AdamW", "scheduler": "ReduceLROnPlateau",
          "print_model": False}
    idx = np.arange(len(toy_dataset))
    run = J.setup_run(toy_dataset, mp, "l1_loss", seed=0)
    _, base, _ = J.run_fused_training(
        run, train_idx=idx[:10], val_idx=idx[10:], epochs=6, verbosity=3,
        seed=0,
    )
    # Tiny budget: every post-warmup chunk must shrink to 1 epoch.
    monkeypatch.setenv("MDL_MAX_DISPATCH_S", "1e-9")
    J.reset_run(run, 0)
    _, capped, _ = J.run_fused_training(
        run, train_idx=idx[:10], val_idx=idx[10:], epochs=6, verbosity=3,
        seed=0,
    )
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(base.params),
                    jax.tree_util.tree_leaves(capped.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_segmented_trainer_matches_fused(toy_dataset, monkeypatch):
    """When one epoch exceeds MDL_MAX_DISPATCH_S, the trainer switches to
    sub-epoch segment dispatches. Same per-step rng sequence and epoch
    state machine ⇒ identical final train state and best-val params."""
    import numpy as np

    from matdeeplearn_tpu.training import jobs as J

    mp = {"model": "CGCNN", "dim1": 8, "dim2": 8, "gc_count": 1,
          "post_fc_count": 1, "batch_size": 4, "epochs": 5, "lr": 0.01,
          "optimizer": "AdamW", "scheduler": "ReduceLROnPlateau",
          "print_model": False}
    idx = np.arange(len(toy_dataset))
    run = J.setup_run(toy_dataset, mp, "l1_loss", seed=0)
    best0, last0, _ = J.run_fused_training(
        run, train_idx=idx[:12], val_idx=idx[12:], epochs=5, verbosity=5,
        seed=3,
    )
    # Budget below any epoch time: forces segment mode with 1 step/dispatch.
    monkeypatch.setenv("MDL_MAX_DISPATCH_S", "1e-12")
    J.reset_run(run, 0)
    best1, last1, _ = J.run_fused_training(
        run, train_idx=idx[:12], val_idx=idx[12:], epochs=5, verbosity=5,
        seed=3,
    )
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(last0.params),
                    jax.tree_util.tree_leaves(last1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(best0.params),
                    jax.tree_util.tree_leaves(best1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
