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
            shuffle_seed=epoch, id_matrix_fn=run.id_matrix_fn,
        )
        state = state.with_lr(run.scheduler.step(train_error))
        if epoch % report_every == 0 or epoch == epochs:
            val_error = T.evaluate_scan(
                run.eval_epoch_fn, state, run.data, val_idx, batch_size,
                id_matrix_fn=run.id_matrix_fn,
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


def _execute_trial(payload: dict) -> dict:
    """Run one trial from a picklable payload; returns its result record.

    Top-level so spawn-based worker processes can import it. Loads (or
    receives) the dataset, trains, checkpoints the best state, and cleans
    up any per-trial processed dir."""
    t = payload["trial"]
    cfg = payload["config"]
    data_path = payload["data_path"]
    trial_ds = payload.get("dataset")
    proc_dir = None
    if trial_ds is None:
        pargs = {**payload["processing_parameters"],
                 **{k: v for k, v in cfg.items() if k in _PROCESSING_KEYS}}
        if payload["needs_reprocess"]:
            proc_dir = f"processed_hyper_{payload['stamp']}_{t}"
            pargs["processed_path"] = proc_dir
        trial_ds = D.get_dataset(
            data_path,
            payload["training_parameters"].get("target_index", 0),
            "False", pargs,
        )
    t0 = time.time()
    try:
        best_val, history = run_trial(
            trial_ds, cfg, payload["job_parameters"],
            payload["training_parameters"], payload["model_parameters"],
            report_every=payload["report_every"],
            rung_checks=payload["rung_checks"],
            checkpoint_path=payload["checkpoint_path"],
            seed=payload["seed"],
        )
    finally:
        if proc_dir and payload["delete_processed"] and data_path:
            import shutil

            full = os.path.join(data_path, proc_dir)
            if os.path.exists(full):
                shutil.rmtree(full)
    return {
        "trial": t, "config": cfg, "best_val": best_val,
        "history": history, "seconds": time.time() - t0,
    }


def _rung_checks(rung_epochs, results) -> list[tuple[int, float]]:
    """Median val error of completed trials at each rung epoch."""
    out = []
    for re_ in rung_epochs:
        vals = [
            h["val"] for r in results for h in r.get("history", [])
            if h.get("epoch") == re_ and "val" in h
        ]
        out.append((re_, float(np.median(vals)) if vals else float("inf")))
    return out


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
    (reference tune_setup, training/training.py:981-1065).

    Concurrency and fault tolerance match the reference's Ray runner:
    `hyper_concurrency` trials run in parallel worker processes
    (config.yml:50; reference training.py:1006) and up to `max_failures`
    crashed trials are tolerated and recorded before the sweep aborts
    (reference training.py:1051). Failed trials are retried on resume.
    On a single TPU chip, worker processes cannot share the device, so
    concurrency >1 falls back to serial unless more than one process can
    own a chip (set MDL_HYPER_FORCE_CONCURRENCY=1 to override)."""
    job_name = str(job_parameters.get("job_name", "hyper_job"))
    trials = int(job_parameters.get("hyper_trials", 10))
    report_every = int(job_parameters.get("hyper_iter", 1))
    resume = str(job_parameters.get("hyper_resume", "True")) == "True"
    delete_processed = str(job_parameters.get("hyper_delete_processed", "True")) == "True"
    seed = int(job_parameters.get("seed") or np.random.randint(1, 1_000_000))
    concurrency = int(job_parameters.get("hyper_concurrency", 1))
    max_failures = int(job_parameters.get("max_failures", 4))

    if concurrency > 1:
        import jax as _jax

        if (_jax.default_backend() == "tpu"
                and not os.environ.get("MDL_HYPER_FORCE_CONCURRENCY")):
            print(
                f"hyper_concurrency={concurrency} requested but a single TPU "
                "chip can only serve one process; running trials serially"
            )
            concurrency = 1

    tdir = _trial_dir(job_name)
    log_path = os.path.join(tdir, "trials.jsonl")
    done = _load_completed(log_path) if resume else []
    # Failed records don't block a retry on resume.
    done_ids = {d["trial"] for d in done if "best_val" in d}
    if not resume and os.path.exists(log_path):
        os.remove(log_path)
        done = []

    epochs = int(model_parameters.get("epochs", 250))
    rung_epochs = sorted({max(1, epochs // 4), max(1, epochs // 2)})

    needs_reprocess = any(k in _PROCESSING_KEYS for k in search_space)
    results = [d for d in done if "best_val" in d]
    stamp = int(time.time())

    def payload_for(t: int) -> dict:
        rng = np.random.default_rng(seed + 1000 * t)
        cfg = sample_space(search_space, rng)
        return {
            "trial": t, "config": cfg, "seed": seed, "stamp": stamp,
            "data_path": data_path,
            # ship the in-memory dataset only when there's no path to load
            # from (worker processes reload via the npz cache instead)
            "dataset": (dataset if (data_path is None and not needs_reprocess)
                        else None),
            "needs_reprocess": needs_reprocess,
            "delete_processed": delete_processed,
            "report_every": report_every,
            "rung_checks": _rung_checks(rung_epochs, results),
            "checkpoint_path": os.path.join(tdir, f"trial_{t}.ckpt"),
            "job_parameters": dict(job_parameters),
            "training_parameters": dict(training_parameters),
            "model_parameters": dict(model_parameters),
            "processing_parameters": dict(processing_parameters or {}),
        }

    def record(rec: dict):
        if "best_val" in rec:
            results.append(rec)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if "best_val" in rec:
            print(f"Trial {rec['trial']}: val={rec['best_val']:.5f} "
                  f"config={rec['config']}")
        else:
            print(f"Trial {rec['trial']} FAILED: {rec['error']}")

    pending = [t for t in range(trials) if t not in done_ids]
    failures = 0

    if concurrency <= 1:
        # Pre-built dataset is reusable serially even when reprocessing is
        # off; avoid a per-trial reload.
        for t in pending:
            p = payload_for(t)
            if dataset is not None and not needs_reprocess:
                p["dataset"] = dataset
            try:
                record(_execute_trial(p))
            except Exception as e:  # noqa: BLE001 — trial crash tolerance
                failures += 1
                record({"trial": t, "config": p["config"], "error": repr(e)})
                if failures > max_failures:
                    raise RuntimeError(
                        f"hyperparameter sweep aborted: {failures} trial "
                        f"failures exceed max_failures={max_failures}"
                    ) from e
    else:
        import concurrent.futures as cf
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        with cf.ProcessPoolExecutor(
            max_workers=concurrency, mp_context=ctx
        ) as pool:
            running: dict = {}
            it = iter(pending)
            abort = None
            while True:
                while abort is None and len(running) < concurrency:
                    t = next(it, None)
                    if t is None:
                        break
                    p = payload_for(t)
                    running[pool.submit(_execute_trial, p)] = p
                if not running:
                    break
                ready, _ = cf.wait(
                    list(running), return_when=cf.FIRST_COMPLETED
                )
                for fut in ready:
                    p = running.pop(fut)
                    try:
                        record(fut.result())
                    except Exception as e:  # noqa: BLE001 — crash tolerance
                        failures += 1
                        record({"trial": p["trial"], "config": p["config"],
                                "error": repr(e)})
                        if failures > max_failures and abort is None:
                            abort = RuntimeError(
                                f"hyperparameter sweep aborted: {failures} "
                                f"trial failures exceed "
                                f"max_failures={max_failures}"
                            )
            if abort is not None:
                raise abort

    if not results:
        raise RuntimeError("no hyperparameter trial finished successfully")
    best = min(results, key=lambda r: r["best_val"])
    print("Best trial hyper_args: {}".format(best["config"]))
    print("Best trial final validation error: {:.5f}".format(best["best_val"]))
    return best
