"""Model-based search (TPE) + mid-trial resume + per-chip slot assignment
(VERDICT r2 missing #3/#4/#5; reference HyperOptSearch training.py:1004-1007
and checkpoint_dir restore training.py:932-939)."""

import json
import os

import numpy as np
import pytest

from matdeeplearn_tpu.training import hyper as H

from conftest import TOY_PROCESSING_ARGS

TRAIN_PARAMS = {"loss": "l1_loss", "train_ratio": 0.7, "val_ratio": 0.15,
                "test_ratio": 0.15, "target_index": 0}
MODEL_PARAMS = {"model": "CGCNN", "epochs": 4, "optimizer": "AdamW",
                "scheduler": "ReduceLROnPlateau", "print_model": False}


# ------------------------------------------------------------------ TPE maths


def _simulate(space, objective, n_trials, search_fn, seed=0):
    rng = np.random.default_rng(seed)
    results = []
    for t in range(n_trials):
        cfg = search_fn(space, results, rng)
        results.append({"trial": t, "config": cfg,
                        "best_val": objective(cfg)})
    return results


def test_tpe_concentrates_on_optimum_numeric():
    """Quadratic objective over LogUniform lr: TPE's post-warmup samples
    sit far closer to the optimum than uniform-random sampling."""
    space = {"lr": H.LogUniform(1e-4, 0.05)}
    target = np.log(3e-3)
    obj = lambda c: float((np.log(c["lr"]) - target) ** 2)
    res = _simulate(space, obj, 40, H.suggest_tpe, seed=1)
    rand = _simulate(space, obj, 40,
                     lambda s, r, g: H.sample_space(s, g), seed=1)
    tail = [r["best_val"] for r in res[20:]]
    rtail = [r["best_val"] for r in rand[20:]]
    assert np.median(tail) < np.median(rtail)
    # and the best found is genuinely near the optimum
    assert min(r["best_val"] for r in res) < 0.05


def test_tpe_concentrates_on_optimum_choice():
    space = {"dim1": H.Choice((10, 50, 100, 150))}
    obj = lambda c: 0.1 if c["dim1"] == 100 else 1.0
    res = _simulate(space, obj, 30, H.suggest_tpe, seed=2)
    tail = [r["config"]["dim1"] for r in res[15:]]
    assert tail.count(100) > len(tail) * 0.5


def test_tpe_first_trials_match_random_stream():
    """Below n_initial the TPE suggester reproduces the plain random
    stream — sweep determinism/resume relies on this."""
    space = {"lr": H.LogUniform(1e-4, 0.05), "dim1": H.Choice((8, 16))}
    a = H.suggest_tpe(space, [], np.random.default_rng(7))
    b = H.sample_space(space, np.random.default_rng(7))
    assert a == b


def test_tpe_respects_bounds():
    space = {"x": H.Uniform(2.0, 3.0)}
    results = [{"config": {"x": 2.0 + 0.1 * i}, "best_val": float(i)}
               for i in range(10)]
    for s in range(5):
        cfg = H.suggest_tpe(space, results, np.random.default_rng(s))
        assert 2.0 <= cfg["x"] <= 3.0


# ------------------------------------------------------------ mid-trial resume


def test_run_trial_resumes_mid_training(toy_dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = {"dim1": 12, "dim2": 8, "gc_count": 1, "post_fc_count": 1,
           "lr": 0.01, "batch_size": 8}
    ckpt = str(tmp_path / "trial_0.ckpt")

    # "interrupted" run: 4 of 8 epochs
    mp4 = {**MODEL_PARAMS, "epochs": 4}
    bv1, h1 = H.run_trial(toy_dataset, cfg, {}, TRAIN_PARAMS, mp4,
                          report_every=2, checkpoint_path=ckpt, seed=3)
    assert [h["epoch"] for h in h1 if "val" in h] == [2, 4]

    # resumed run continues at epoch 5, not epoch 1
    mp8 = {**MODEL_PARAMS, "epochs": 8}
    bv2, h2 = H.run_trial(toy_dataset, cfg, {}, TRAIN_PARAMS, mp8,
                          report_every=2, checkpoint_path=ckpt, seed=3,
                          resume_from_checkpoint=True)
    assert [h["epoch"] for h in h2 if "val" in h] == [6, 8]
    assert bv2 <= bv1 + 1e-9  # best_val carries over


def test_sweep_resumes_interrupted_trial_with_original_config(
        toy_dataset, tmp_path, monkeypatch):
    """Kill a sweep mid-trial (via an injected exception after the trial
    checkpointed), re-run tune_setup, and check the trial resumed with the
    same config from its recorded epoch instead of restarting."""
    monkeypatch.chdir(tmp_path)
    space = {"dim1": H.Choice((12,)), "dim2": 8, "gc_count": 1,
             "post_fc_count": 1, "lr": 0.01, "batch_size": 8}
    job = {"job_name": "midresume", "hyper_trials": 1, "hyper_iter": 2,
           "hyper_resume": "True", "seed": 9, "max_failures": 0}

    real_run_trial = H.run_trial
    calls = {}

    def dying_run_trial(*a, **kw):
        # run 3 epochs (one checkpoint at epoch 2), then die
        kw2 = dict(kw)
        mp = dict(a[4])
        mp["epochs"] = 3
        real_run_trial(a[0], a[1], a[2], a[3], mp, **kw2)
        raise RuntimeError("simulated preemption")

    monkeypatch.setattr(H, "run_trial", dying_run_trial)
    with pytest.raises(RuntimeError):
        H.tune_setup(space, job, dict(TOY_PROCESSING_ARGS), TRAIN_PARAMS,
                     dict(MODEL_PARAMS, epochs=6), dataset=toy_dataset)
    assert os.path.exists("results/midresume/trial_0.ckpt")

    monkeypatch.setattr(H, "run_trial", real_run_trial)

    resumed_epochs = []
    def spying_run_trial(*a, **kw):
        bv, hist = real_run_trial(*a, **kw)
        resumed_epochs.extend(h["epoch"] for h in hist if "val" in h)
        calls["resume_flag"] = kw.get("resume_from_checkpoint")
        calls["config"] = a[1]
        return bv, hist

    monkeypatch.setattr(H, "run_trial", spying_run_trial)
    best = H.tune_setup(space, job, dict(TOY_PROCESSING_ARGS), TRAIN_PARAMS,
                        dict(MODEL_PARAMS, epochs=6), dataset=toy_dataset)
    assert calls["resume_flag"] is True
    assert calls["config"]["dim1"] == 12
    # resumed past the checkpointed epoch (2 or 3), not from scratch
    assert min(resumed_epochs) > 2
    assert np.isfinite(best["best_val"])


def test_concurrent_workers_get_distinct_slots(toy_data_dir, toy_dataset,
                                               tmp_path, monkeypatch):
    """Each in-flight trial owns a device slot (per-chip pinning contract);
    records carry the assigned env."""
    monkeypatch.chdir(tmp_path)
    space = {"dim1": H.Choice((12,)), "dim2": 8, "gc_count": 1,
             "post_fc_count": 1, "lr": 0.01, "batch_size": 8, "epochs": 2}
    job = {"job_name": "slots", "hyper_trials": 3, "hyper_iter": 1,
           "hyper_resume": "True", "seed": 5, "max_failures": 0,
           "hyper_concurrency": 2}
    H.tune_setup(space, job, dict(TOY_PROCESSING_ARGS), TRAIN_PARAMS,
                 MODEL_PARAMS, data_path=toy_data_dir)
    with open("results/slots/trials.jsonl") as f:
        recs = [json.loads(l) for l in f if l.strip()]
    ok = [r for r in recs if "best_val" in r]
    assert len(ok) == 3
    slots = {r["device_env"]["MDL_TRIAL_SLOT"] for r in ok}
    assert slots <= {"0", "1"} and len(slots) == 2
