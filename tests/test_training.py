"""Training layer: losses, scheduler parity vs torch, end-to-end fit,
checkpoint roundtrip, job outputs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from matdeeplearn_tpu.training import (
    ReduceLROnPlateau,
    build_optimizer,
    get_loss,
    load_checkpoint,
    save_checkpoint,
)
from matdeeplearn_tpu.training import jobs as J
from matdeeplearn_tpu.training import train as T


def test_losses_match_torch(rng):
    p = rng.standard_normal(16).astype(np.float32)
    y = rng.standard_normal(16).astype(np.float32)
    m = jnp.ones(16)
    for name, tfn in [
        ("l1_loss", torch.nn.functional.l1_loss),
        ("mse_loss", torch.nn.functional.mse_loss),
        ("smooth_l1_loss", torch.nn.functional.smooth_l1_loss),
        ("huber_loss", torch.nn.functional.huber_loss),
    ]:
        got = float(get_loss(name)(jnp.asarray(p), jnp.asarray(y), m))
        want = float(tfn(torch.tensor(p), torch.tensor(y)))
        assert abs(got - want) < 1e-6, name


def test_loss_masking():
    p = jnp.array([1.0, 2.0, 100.0])
    y = jnp.array([0.0, 0.0, 0.0])
    m = jnp.array([1.0, 1.0, 0.0])
    assert abs(float(get_loss("l1_loss")(p, y, m)) - 1.5) < 1e-6


def test_plateau_scheduler_matches_torch():
    targs = dict(mode="min", factor=0.8, patience=3, min_lr=1e-5, threshold=2e-4)
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(lin.parameters(), lr=0.01)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, **targs)
    sched = ReduceLROnPlateau(lr=0.01, **targs)
    rng = np.random.default_rng(3)
    metrics = np.abs(np.cumsum(rng.standard_normal(60))) * 0.1 + 0.01
    for mtr in metrics:
        tsched.step(float(mtr))
        lr = sched.step(float(mtr))
        assert abs(lr - opt.param_groups[0]["lr"]) < 1e-12


def test_adamw_step_matches_torch(rng):
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    g = rng.standard_normal((4, 3)).astype(np.float32)
    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.AdamW([tw], lr=0.01)
    tw.grad = torch.tensor(g)
    topt.step()

    tx = build_optimizer("AdamW", 0.01, {})
    params = {"w": jnp.asarray(w0)}
    ostate = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g)}, ostate, params)
    neww = np.asarray(params["w"] + updates["w"])
    np.testing.assert_allclose(neww, tw.detach().numpy(), atol=1e-6)


@pytest.fixture(scope="module")
def trained(toy_dataset, tmp_path_factory):
    d = tmp_path_factory.mktemp("job")
    cwd = os.getcwd()
    os.chdir(d)
    try:
        jp = {"job_name": "t", "seed": 11, "save_model": "True",
              "model_path": "model.ckpt", "write_output": "True",
              "write_error": "True"}
        tp = {"loss": "l1_loss", "train_ratio": 0.7, "val_ratio": 0.15,
              "test_ratio": 0.15, "verbosity": 0}
        mp = {"model": "CGCNN", "dim1": 16, "dim2": 16, "gc_count": 2,
              "post_fc_count": 1, "epochs": 30, "lr": 0.01, "batch_size": 8,
              "optimizer": "AdamW", "optimizer_args": {},
              "scheduler": "ReduceLROnPlateau",
              "scheduler_args": {"mode": "min", "factor": 0.8, "patience": 10,
                                  "min_lr": 1e-5, "threshold": 2e-4},
              "print_model": False}
        errors = J.train_regular(toy_dataset, jp, tp, mp)
        yield d, errors
    finally:
        os.chdir(cwd)


def test_train_regular_learns_and_writes(trained, toy_dataset):
    d, errors = trained
    assert np.isfinite(errors["train"]) and errors["train"] < 1.5
    for split in ("train", "val", "test"):
        f = d / f"t_{split}_outputs.csv"
        assert f.exists()
        lines = f.read_text().strip().splitlines()
        assert lines[0] == "ids,target,prediction"
    assert (d / "model.ckpt").exists()
    assert (d / "t_errorvalues.csv").exists()


def test_predict_roundtrip(trained, toy_dataset):
    d, errors = trained
    cwd = os.getcwd()
    os.chdir(d)
    try:
        err = J.predict(toy_dataset, "l1_loss",
                        {"job_name": "p", "model_path": "model.ckpt"})
        assert np.isfinite(err)
        assert os.path.exists("p_predicted_outputs.csv")
    finally:
        os.chdir(cwd)


def test_checkpoint_roundtrip(toy_dataset, tmp_path):
    run = J.setup_run(toy_dataset, {"model": "GCN", "dim1": 8, "dim2": 8,
                                    "gc_count": 1, "post_fc_count": 1,
                                    "batch_size": 4, "lr": 0.01},
                      "l1_loss", seed=0)
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, run.state, run.scheduler, run.model_name,
                    run.model_config)
    meta, restored = load_checkpoint(path, run.state)
    assert meta["model_name"] == "GCN"
    a = jax.tree_util.tree_leaves(run.state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_analysis_job(trained, toy_dataset):
    d, _ = trained
    cwd = os.getcwd()
    os.chdir(d)
    try:
        out = J.analysis(toy_dataset, "model.ckpt",
                         {"perplexity": 5, "n_iter": 250}, batch_size=8)
        assert out.shape == (len(toy_dataset), 2)
        assert os.path.exists("tsne_output.csv")
    finally:
        os.chdir(cwd)
