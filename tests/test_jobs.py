"""Job-level coverage: CV / Repeat / Ensemble / Hyperparameter + CLI config
merge semantics."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def jobdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


MP = {"model": "CGCNN", "dim1": 10, "dim2": 10, "gc_count": 1,
      "post_fc_count": 1, "epochs": 4, "lr": 0.01, "batch_size": 8,
      "optimizer": "AdamW", "optimizer_args": {},
      "scheduler": "ReduceLROnPlateau",
      "scheduler_args": {"mode": "min", "factor": 0.8, "patience": 10,
                          "min_lr": 1e-5, "threshold": 2e-4},
      "print_model": False}
TP = {"loss": "l1_loss", "train_ratio": 0.7, "val_ratio": 0.15,
      "test_ratio": 0.15, "verbosity": 0}


def test_train_cv(toy_dataset, jobdir):
    from matdeeplearn_tpu.training import train_CV

    err = train_CV(
        toy_dataset,
        {"job_name": "cv", "cv_folds": 3, "seed": 7, "write_output": "True"},
        TP, MP,
    )
    assert np.isfinite(err)
    f = jobdir / "cv_CV_outputs.csv"
    assert f.exists()
    # 3 folds x 5 graphs each (16 // 3 = 5)
    assert len(f.read_text().strip().splitlines()) == 16  # header + 15


def test_train_repeat(toy_dataset, jobdir):
    from matdeeplearn_tpu.training import train_repeat

    errs = train_repeat(
        toy_dataset,
        {"job_name": "rep", "repeat_trials": 2, "seed": 0,
         "model_path": "m.ckpt", "write_output": "False"},
        TP, MP,
    )
    assert errs.shape == (2, 3)
    lines = (jobdir / "rep_all_errorvalues.csv").read_text().strip().splitlines()
    assert lines[0].startswith(",Training,Validation,Test")
    assert len(lines) == 5  # 2 trials + mean + std + header


def test_train_ensemble(toy_dataset, jobdir):
    from matdeeplearn_tpu.training import train_ensemble

    err = train_ensemble(
        toy_dataset,
        {"job_name": "ens", "ensemble_list": "A,B", "seed": 5,
         "model_path": "m.ckpt", "write_output": "Partial",
         "save_model": "False"},
        TP,
        {"A": MP, "B": {**MP, "model": "GCN"}},
    )
    assert np.isfinite(err)
    f = jobdir / "ens_test_ensemble_outputs.csv"
    assert f.exists()


def test_hyperparameter_search(toy_dataset, jobdir):
    from matdeeplearn_tpu.training import hyper as H

    space = {
        "dim1": H.Choice((8, 12)),
        "lr": H.LogUniform(1e-3, 1e-2),
        "batch_size": 8,
    }
    best = H.tune_setup(
        space,
        {"job_name": "hp", "hyper_trials": 2, "hyper_iter": 2,
         "hyper_resume": "False", "seed": 9},
        {}, TP, {**MP, "epochs": 4},
        dataset=toy_dataset,
    )
    assert "config" in best and np.isfinite(best["best_val"])
    log = jobdir / "results" / "hp" / "trials.jsonl"
    assert log.exists()

    def _results():
        import json as _json

        recs = [_json.loads(l) for l in log.read_text().strip().splitlines()]
        return [r for r in recs if r.get("event") != "started"]

    assert len(_results()) == 2

    # resume skips completed trials
    best2 = H.tune_setup(
        space,
        {"job_name": "hp", "hyper_trials": 2, "hyper_iter": 2,
         "hyper_resume": "True", "seed": 9},
        {}, TP, {**MP, "epochs": 4},
        dataset=toy_dataset,
    )
    assert len(_results()) == 2
    assert best2["best_val"] == best["best_val"]


def test_cli_config_merge(tmp_path, monkeypatch):
    import main as cli

    monkeypatch.chdir(tmp_path)
    import shutil

    shutil.copy(os.path.join(os.path.dirname(os.path.abspath(cli.__file__)),
                             "config.yml"), "config.yml")
    args = cli.build_parser().parse_args(
        ["--run_mode=Training", "--job_name=xyz", "--lr=0.123",
         "--batch_size=7", "--data_path=/tmp/nowhere", "--seed=42"]
    )
    config = cli.load_config(args)
    assert config["Job"]["job_name"] == "xyz"
    assert config["Job"]["seed"] == 42
    assert config["Models"]["lr"] == 0.123
    assert config["Models"]["batch_size"] == 7
    assert config["Processing"]["data_path"] == "/tmp/nowhere"
    assert config["Models"]["model"] == "CGCNN"


def test_cli_ensemble_models(tmp_path, monkeypatch):
    import main as cli
    import shutil

    monkeypatch.chdir(tmp_path)
    shutil.copy(os.path.join(os.path.dirname(os.path.abspath(cli.__file__)),
                             "config.yml"), "config.yml")
    args = cli.build_parser().parse_args(["--run_mode=Ensemble"])
    config = cli.load_config(args)
    assert set(config["Models"]) == {"CGCNN_demo"}
    assert len(config["Job"]["ensemble_list"]) == 5
