"""Fused multi-epoch trainer: on-device plateau scheduler parity and
equivalence with the per-epoch host-driven path."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from matdeeplearn_tpu.training.fused import (
    PlateauState,
    plateau_init,
    plateau_step,
)
from matdeeplearn_tpu.training import jobs as J


def test_device_plateau_matches_torch():
    kwargs = dict(factor=0.8, patience=3, threshold=2e-4, min_lr=1e-5)
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(lin.parameters(), lr=0.01)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", **{**kwargs, "min_lr": 1e-5}
    )
    s = plateau_init(0.01)
    rng = np.random.default_rng(5)
    metrics = np.abs(np.cumsum(rng.standard_normal(80))) * 0.05 + 0.01
    for m in metrics:
        tsched.step(float(m))
        s = plateau_step(s, jnp.asarray(m, jnp.float32), **kwargs)
        assert abs(float(s.lr) - opt.param_groups[0]["lr"]) < 1e-9


def test_fused_training_equivalent_to_stepwise(toy_dataset):
    """Same seeds → the fused trainer and per-epoch scan path produce the
    same final train error (scheduler constant to avoid fp drift paths)."""
    mp = {"model": "CGCNN", "dim1": 12, "dim2": 12, "gc_count": 1,
          "post_fc_count": 1, "batch_size": 8, "lr": 0.02,
          "optimizer": "AdamW", "scheduler": "ReduceLROnPlateau",
          "scheduler_args": {"mode": "min", "factor": 0.8, "patience": 5,
                              "min_lr": 1e-5, "threshold": 2e-4}}
    run1 = J.setup_run(toy_dataset, mp, "l1_loss", seed=3)
    run2 = J.setup_run(toy_dataset, mp, "l1_loss", seed=3)
    train_idx = np.arange(12)
    val_idx = np.arange(12, 16)

    best1, last1, sched1 = J.run_fused_training(
        run1, train_idx=train_idx, val_idx=val_idx,
        epochs=10, verbosity=0, seed=3,
    )

    # stepwise path with host-side scheduler
    from matdeeplearn_tpu.training import train as T
    from matdeeplearn_tpu.training.scheduler import ReduceLROnPlateau

    state = run2.state
    sched = ReduceLROnPlateau(lr=0.02, factor=0.8, patience=5,
                              min_lr=1e-5, threshold=2e-4)
    rng = jax.random.PRNGKey(3)
    for epoch in range(1, 11):
        state, terr, rng = T.train_epoch_scan(
            run2.train_epoch_fn, state, run2.data, train_idx, 8, rng,
            shuffle_seed=3 + epoch,
        )
        state = state.with_lr(sched.step(terr))

    np.testing.assert_allclose(float(sched1.lr), sched.lr, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(last1.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_best_val_tracking(toy_dataset):
    mp = {"model": "GCN", "dim1": 8, "dim2": 8, "gc_count": 1,
          "post_fc_count": 1, "batch_size": 8, "lr": 0.05,
          "optimizer": "AdamW", "scheduler": "ReduceLROnPlateau",
          "scheduler_args": {"factor": 0.8, "patience": 10}}
    run = J.setup_run(toy_dataset, mp, "l1_loss", seed=1)
    best, last, sched = J.run_fused_training(
        run, train_idx=np.arange(12), val_idx=np.arange(12, 16),
        epochs=8, verbosity=0, seed=1,
    )
    from matdeeplearn_tpu.training import train as T

    ev = T.make_eval_epoch_fn(run.model, "l1_loss", run.spec)
    best_err = T.evaluate_scan(ev, best, run.data, np.arange(12, 16), 8)
    last_err = T.evaluate_scan(ev, last, run.data, np.arange(12, 16), 8)
    assert best_err <= last_err + 1e-6
