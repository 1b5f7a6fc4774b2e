"""Hyperparameter search — first-party trial runner.

The reference delegates to Ray Tune + HyperOptSearch with checkpointed,
resumable trials (training/training.py:846-1065, main.py:367-509). Ray's
role there is host-level orchestration, not on-step compute; here it is a
dependency-free runner with:

  * the same per-model search spaces (main.py:402-479) expressed in a tiny
    space DSL (choice/uniform/loguniform),
  * median-rule early stopping (ASHA-style rungs) instead of TPE — trials
    that trail the median validation error at a rung are stopped,
  * resumable state: every trial appends to results/<job>/trials.jsonl and
    is skipped on re-run (reference hyper_resume, config.yml:54),
  * per-trial reprocessing into a timestamped dir when processing-level
    params (SOAP rcut/nmax/lmax/sigma) are sampled (reference
    training.py:872-875).

Note: the reference samples a "gnn_count" key that its models silently
ignore (models take **kwargs; the real field is gc_count) — we search
gc_count so depth is actually tuned.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import jax
import numpy as np

from matdeeplearn_tpu.data import dataset as D
from matdeeplearn_tpu.training import train as T
from matdeeplearn_tpu.training.checkpoint import save_checkpoint
from matdeeplearn_tpu.training.jobs import setup_run


# ------------------------------------------------------------------ space DSL


@dataclass(frozen=True)
class Choice:
    options: tuple

    def sample(self, rng):
        return self.options[int(rng.integers(len(self.options)))]


@dataclass(frozen=True)
class Uniform:
    lo: float
    hi: float

    def sample(self, rng):
        return float(rng.uniform(self.lo, self.hi))


@dataclass(frozen=True)
class LogUniform:
    lo: float
    hi: float

    def sample(self, rng):
        return float(np.exp(rng.uniform(np.log(self.lo), np.log(self.hi))))


def sample_space(space: dict, rng) -> dict:
    out = {}
    for k, v in space.items():
        out[k] = v.sample(rng) if hasattr(v, "sample") else v
    return out


_DIMS = Choice(tuple(x * 10 for x in range(1, 20)))
_BATCH = Choice(tuple(x * 10 for x in range(1, 20)))
_GC = Choice((1, 2, 3, 4, 5, 6, 7, 8, 9))
_POST = Choice((1, 2, 3, 4, 5, 6))
_POOL = Choice(("global_mean_pool", "global_add_pool", "global_max_pool", "set2set"))
_LR = LogUniform(1e-4, 0.05)


def default_search_space(model_name: str, processing_args: dict | None = None) -> dict:
    """Per-model spaces matching main.py:402-479 (gnn_count → gc_count)."""
    base = {
        "dim1": _DIMS, "dim2": _DIMS, "gc_count": _GC, "post_fc_count": _POST,
        "pool": _POOL, "lr": _LR, "batch_size": _BATCH,
    }
    name = model_name.split("_")[0]
    if name in ("SchNet",):
        return {**base, "dim3": _DIMS,
                "cutoff": (processing_args or {}).get("graph_max_radius", 8.0)}
    if name in ("MPNN", "MEGNet"):
        return {**base, "dim3": _DIMS}
    if name == "SOAP":
        return {"dim1": _DIMS, "fc_count": _POST, "lr": _LR, "batch_size": _BATCH,
                "SOAP_nmax": _GC, "SOAP_lmax": _GC,
                "SOAP_sigma": Uniform(0.1, 2.0), "SOAP_rcut": Uniform(1.0, 10.0)}
    if name == "SM":
        return {"dim1": _DIMS, "fc_count": _POST, "lr": _LR, "batch_size": _BATCH}
    return base


_PROCESSING_KEYS = {
    "SOAP_nmax", "SOAP_lmax", "SOAP_sigma", "SOAP_rcut",
    "graph_max_radius", "graph_max_neighbors", "graph_edge_length",
}


# ---------------------------------------------------------------- trial runner


def _trial_dir(job_name: str) -> str:
    d = os.path.join("results", str(job_name))
    os.makedirs(d, exist_ok=True)
    return d


def _load_completed(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def run_trial(
    dataset: D.GraphDataset,
    trial_config: dict,
    job_parameters: dict,
    training_parameters: dict,
    model_parameters: dict,
    *,
    report_every: int = 1,
    rung_checks: list[tuple[int, float]] | None = None,
    checkpoint_path: str | None = None,
    seed: int = 0,
):
    """Train one sampled config; returns (best_val_error, history).

    rung_checks: [(epoch, median_so_far)] — stop early if val > median
    at that rung (median rule / ASHA-style grace).
    """
    mp = {**model_parameters, **{k: v for k, v in trial_config.items()
                                 if k not in _PROCESSING_KEYS}}
    loss = training_parameters.get("loss", "l1_loss")
    batch_size = int(mp.get("batch_size", 100))
    epochs = int(mp.get("epochs", 250))

    train_idx, val_idx, _ = D.split_data(
        dataset,
        training_parameters.get("train_ratio", 0.8),
        training_parameters.get("val_ratio", 0.05),
        training_parameters.get("test_ratio", 0.15),
        seed=seed,
    )
    run = setup_run(dataset, mp, loss, seed=seed, print_model=False)
    state = run.state
    rngs = jax.random.PRNGKey(seed)
    best_val = float("inf")
    history = []
    rungs = dict(rung_checks or [])
    for epoch in range(1, epochs + 1):
        state, train_error, rngs = T.train_epoch_scan(
            run.train_epoch_fn, state, run.data, train_idx, batch_size, rngs,
            shuffle_seed=epoch,
        )
        state = state.with_lr(run.scheduler.step(train_error))
        if epoch % report_every == 0 or epoch == epochs:
            val_error = T.evaluate_scan(
                run.eval_epoch_fn, state, run.data, val_idx, batch_size
            )
            history.append({"epoch": epoch, "train": train_error, "val": val_error})
            if val_error < best_val:
                best_val = val_error
                if checkpoint_path:
                    save_checkpoint(
                        checkpoint_path, state, run.scheduler,
                        run.model_name, run.model_config,
                    )
            if epoch in rungs and np.isfinite(rungs[epoch]) and val_error > rungs[epoch]:
                history.append({"epoch": epoch, "stopped": "median_rule"})
                break
    return best_val, history


def tune_setup(
    search_space: dict,
    job_parameters: dict,
    processing_parameters: dict,
    training_parameters: dict,
    model_parameters: dict,
    data_path: str | None = None,
    dataset: D.GraphDataset | None = None,
) -> dict:
    """Run the search; returns {"config", "best_val", "trial"} of the winner
    (reference tune_setup, training/training.py:981-1065)."""
    job_name = str(job_parameters.get("job_name", "hyper_job"))
    trials = int(job_parameters.get("hyper_trials", 10))
    report_every = int(job_parameters.get("hyper_iter", 1))
    resume = str(job_parameters.get("hyper_resume", "True")) == "True"
    delete_processed = str(job_parameters.get("hyper_delete_processed", "True")) == "True"
    seed = int(job_parameters.get("seed") or np.random.randint(1, 1_000_000))

    tdir = _trial_dir(job_name)
    log_path = os.path.join(tdir, "trials.jsonl")
    done = _load_completed(log_path) if resume else []
    done_ids = {d["trial"] for d in done}
    if not resume and os.path.exists(log_path):
        os.remove(log_path)
        done = []

    epochs = int(model_parameters.get("epochs", 250))
    rung_epochs = sorted({max(1, epochs // 4), max(1, epochs // 2)})

    needs_reprocess = any(k in _PROCESSING_KEYS for k in search_space)
    results = list(done)
    for t in range(trials):
        if t in done_ids:
            continue
        rng = np.random.default_rng(seed + 1000 * t)
        cfg = sample_space(search_space, rng)

        trial_ds = dataset
        proc_dir = None
        if needs_reprocess or trial_ds is None:
            pargs = {**processing_parameters,
                     **{k: v for k, v in cfg.items() if k in _PROCESSING_KEYS}}
            proc_dir = f"processed_hyper_{int(time.time())}_{t}"
            pargs["processed_path"] = proc_dir
            trial_ds = D.get_dataset(
                data_path, training_parameters.get("target_index", 0),
                "False", pargs,
            )

        # median val error of prior trials at each rung
        rung_checks = []
        for re_ in rung_epochs:
            vals = [
                h["val"] for r in results for h in r.get("history", [])
                if h.get("epoch") == re_ and "val" in h
            ]
            rung_checks.append((re_, float(np.median(vals)) if vals else float("inf")))

        t0 = time.time()
        best_val, history = run_trial(
            trial_ds, cfg, job_parameters, training_parameters, model_parameters,
            report_every=report_every, rung_checks=rung_checks,
            checkpoint_path=os.path.join(tdir, f"trial_{t}.ckpt"),
            seed=seed,
        )
        rec = {
            "trial": t, "config": cfg, "best_val": best_val,
            "history": history, "seconds": time.time() - t0,
        }
        results.append(rec)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"Trial {t}: val={best_val:.5f} config={cfg}")

        if proc_dir and delete_processed and data_path:
            import shutil

            full = os.path.join(data_path, proc_dir)
            if os.path.exists(full):
                shutil.rmtree(full)

    finished = [r for r in results if "best_val" in r]
    best = min(finished, key=lambda r: r["best_val"])
    print("Best trial hyper_args: {}".format(best["config"]))
    print("Best trial final validation error: {:.5f}".format(best["best_val"]))
    return best
