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


# -------------------------------------------------------------- TPE suggester


def _norm_logpdf(x, mu, sigma):
    return -0.5 * ((x - mu) / sigma) ** 2 - np.log(sigma) - 0.9189385332046727


def _kde_logdensity(x, centers, lo, hi):
    """Parzen-window log density: Gaussian mixture at observed points with a
    range-scaled bandwidth (HyperOpt-style heuristic) plus a uniform prior
    component so unexplored regions keep nonzero mass."""
    centers = np.asarray(centers, np.float64)
    span = max(hi - lo, 1e-12)
    sigma = max(span / max(np.sqrt(len(centers)), 1.0), 1e-3 * span)
    comp = _norm_logpdf(x, centers, sigma)  # (n_centers,)
    # mixture of the n kernels and one uniform(lo,hi) pseudo-kernel
    logs = np.concatenate([comp, [np.log(1.0 / span)]])
    return float(np.logaddexp.reduce(logs) - np.log(len(logs)))


def suggest_tpe(
    space: dict,
    results: list[dict],
    rng,
    n_initial: int = 5,
    gamma: float = 0.25,
    n_candidates: int = 24,
) -> dict:
    """Tree-structured Parzen Estimator suggestion (the reference's
    HyperOptSearch role, training/training.py:1004-1007, 5 initial points).

    Below `n_initial` completed trials: plain random sampling (identical
    rng stream to sample_space, so early trials are reproducible). After:
    split completed trials at the `gamma` quantile of val error into
    good/bad sets, model each dimension with Parzen windows l(x) (good) and
    g(x) (bad), draw `n_candidates` from l, keep the candidate maximizing
    Σ_dims log l(x)/g(x) (per-dimension independent TPE, as HyperOpt)."""
    obs = [
        (r["config"], float(r["best_val"]))
        for r in results
        if np.isfinite(r.get("best_val", np.inf))
    ]
    if len(obs) < n_initial:
        return sample_space(space, rng)
    obs.sort(key=lambda cv: cv[1])
    n_good = max(1, int(np.ceil(gamma * len(obs))))
    good = [c for c, _ in obs[:n_good]]
    bad = [c for c, _ in obs[n_good:]] or good

    best_cand, best_score = None, -np.inf
    for _ in range(n_candidates):
        cand, score = {}, 0.0
        for k, dist in space.items():
            if not hasattr(dist, "sample"):
                cand[k] = dist
                continue
            gv = [c[k] for c in good if k in c]
            bv = [c[k] for c in bad if k in c]
            if not gv or not bv:
                cand[k] = dist.sample(rng)
                continue
            if isinstance(dist, Choice):
                opts = list(dist.options)
                idx = {o: i for i, o in enumerate(opts)}
                pg = np.ones(len(opts))
                pb = np.ones(len(opts))
                for v in gv:
                    pg[idx[v]] += 1
                for v in bv:
                    pb[idx[v]] += 1
                pg /= pg.sum()
                pb /= pb.sum()
                i = int(rng.choice(len(opts), p=pg))
                cand[k] = opts[i]
                score += float(np.log(pg[i]) - np.log(pb[i]))
            else:
                logspace = isinstance(dist, LogUniform)
                tx = np.log if logspace else (lambda v: np.asarray(v, float))
                lo, hi = float(tx(dist.lo)), float(tx(dist.hi))
                gl = [float(tx(v)) for v in gv]
                bl = [float(tx(v)) for v in bv]
                span = max(hi - lo, 1e-12)
                sigma = max(span / max(np.sqrt(len(gl)), 1.0), 1e-3 * span)
                x = float(np.clip(
                    gl[int(rng.integers(len(gl)))] + sigma * rng.normal(),
                    lo, hi,
                ))
                score += (_kde_logdensity(x, gl, lo, hi)
                          - _kde_logdensity(x, bl, lo, hi))
                cand[k] = float(np.exp(x)) if logspace else x
        if score > best_score:
            best_cand, best_score = cand, score
    return best_cand


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
    resume_from_checkpoint: bool = False,
):
    """Train one sampled config; returns (best_val_error, history).

    rung_checks: [(epoch, median_so_far)] — stop early if val > median
    at that rung (median rule / ASHA-style grace).

    Checkpoints every `report_every` epochs (model + optimizer + scheduler
    + epoch/best_val header — the reference's tune.checkpoint_dir cadence,
    training.py:963-976). With resume_from_checkpoint, an interrupted trial
    continues from its recorded epoch instead of restarting at 0
    (reference training.py:932-939).

    NOTE: trial_<t>.ckpt is a RESUME point — the LAST state at the latest
    report interval, not the best-val model. Consumers wanting the winning
    weights for inference must retrain the best config (what tune_setup's
    caller does, matching the reference's use of the optimized
    hyperparameters JSON) rather than load a trial checkpoint."""
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
    best_val = float("inf")
    start_epoch = 0
    if (resume_from_checkpoint and checkpoint_path
            and os.path.exists(checkpoint_path)):
        from matdeeplearn_tpu.training.checkpoint import load_checkpoint

        meta, state = load_checkpoint(checkpoint_path, run.state)
        if meta.get("scheduler"):
            run.scheduler = run.scheduler.__class__.from_state_dict(
                meta["scheduler"]
            )
        start_epoch = int(meta.get("epoch", 0))
        best_val = float(meta.get("best_val", np.inf))
        print(f"resuming trial from epoch {start_epoch} "
              f"(best_val={best_val:.5f})")
    rngs = jax.random.PRNGKey(seed)
    history = []
    rungs = dict(rung_checks or [])
    for epoch in range(start_epoch + 1, epochs + 1):
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
            best_val = min(best_val, val_error) if np.isfinite(val_error) else best_val
            if checkpoint_path:
                save_checkpoint(
                    checkpoint_path, state, run.scheduler,
                    run.model_name, run.model_config,
                    extra_meta={"epoch": epoch, "best_val": best_val},
                )
            if epoch in rungs and np.isfinite(rungs[epoch]) and val_error > rungs[epoch]:
                history.append({"epoch": epoch, "stopped": "median_rule"})
                break
    return best_val, history


def _execute_trial(payload: dict) -> dict:
    """Run one trial from a picklable payload; returns its result record.

    Top-level so spawn-based worker processes can import it. Loads (or
    receives) the dataset, trains, checkpoints per report interval, and
    cleans up any per-trial processed dir.

    payload["device_env"] (per-chip trial pinning): applied to os.environ
    BEFORE any jax backend initialization in this process — with a fresh
    worker per trial (max_tasks_per_child=1) TPU_VISIBLE_CHIPS pins the
    trial to one chip of a multi-chip host."""
    denv = payload.get("device_env") or {}
    if denv:
        os.environ.update({k: str(v) for k, v in denv.items()})
        if "JAX_PLATFORMS" in denv:
            # Some TPU plugins (axon) register regardless of the env var;
            # pin the platform through jax.config before backend init so a
            # CPU-parent sweep's workers can never grab the TPU.
            import jax as _jax

            try:
                _jax.config.update("jax_platforms", str(denv["JAX_PLATFORMS"]))
            except Exception:
                pass
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
            resume_from_checkpoint=payload.get("resume_trial", False),
        )
    finally:
        if proc_dir and payload["delete_processed"] and data_path:
            import shutil

            full = os.path.join(data_path, proc_dir)
            if os.path.exists(full):
                shutil.rmtree(full)
    rec = {
        "trial": t, "config": cfg, "best_val": best_val,
        "history": history, "seconds": time.time() - t0,
    }
    if denv:
        rec["device_env"] = denv
    return rec


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

    Search: `hyper_search: "tpe"` (default — the reference's HyperOptSearch
    role with 5 random initial points, training.py:1004-1007) or
    `"random"` (uniform + median-rule stopping only).

    Concurrency and fault tolerance match the reference's Ray runner:
    `hyper_concurrency` trials run in parallel worker processes
    (config.yml:50; reference training.py:1006) and up to `max_failures`
    crashed trials are tolerated and recorded before the sweep aborts
    (reference training.py:1051). On a multi-chip TPU host each concurrent
    trial is pinned to its own chip (TPU_VISIBLE_CHIPS per fresh worker
    process — the TPU analog of Ray's 1-GPU-per-trial, training.py:1034);
    a single chip serves one process, so concurrency >1 falls back to
    serial there (set MDL_HYPER_FORCE_CONCURRENCY=1 to override).

    Resume: completed trials are skipped; an interrupted trial whose
    `trial_<t>.ckpt` exists continues mid-training from its recorded epoch
    with its originally sampled config (persisted as a "started" record);
    failed trials without a checkpoint are retried from scratch."""
    job_name = str(job_parameters.get("job_name", "hyper_job"))
    trials = int(job_parameters.get("hyper_trials", 10))
    report_every = int(job_parameters.get("hyper_iter", 1))
    resume = str(job_parameters.get("hyper_resume", "True")) == "True"
    delete_processed = str(job_parameters.get("hyper_delete_processed", "True")) == "True"
    seed = int(job_parameters.get("seed") or np.random.randint(1, 1_000_000))
    concurrency = int(job_parameters.get("hyper_concurrency", 1))
    max_failures = int(job_parameters.get("max_failures", 4))
    search = str(job_parameters.get("hyper_search", "tpe")).lower()

    n_chips = 1
    tpu_backend = False
    if concurrency > 1:
        import jax as _jax

        tpu_backend = _jax.default_backend() == "tpu"
        if tpu_backend:
            n_chips = len(_jax.devices())
            if (n_chips <= 1
                    and not os.environ.get("MDL_HYPER_FORCE_CONCURRENCY")):
                print(
                    f"hyper_concurrency={concurrency} requested but this "
                    "host has one TPU chip, which serves one process; "
                    "running trials serially"
                )
                concurrency = 1
            elif n_chips > 1:
                concurrency = min(concurrency, n_chips)
                print(
                    f"pinning {concurrency} concurrent trials to one TPU "
                    f"chip each ({n_chips} chips visible)"
                )

    tdir = _trial_dir(job_name)
    log_path = os.path.join(tdir, "trials.jsonl")
    done = _load_completed(log_path) if resume else []
    # Failed records don't block a retry on resume.
    done_ids = {d["trial"] for d in done if "best_val" in d}
    # Config each trial started with (for mid-training resume).
    started_cfgs = {d["trial"]: d["config"] for d in done
                    if d.get("event") == "started"}
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
        ckpt = os.path.join(tdir, f"trial_{t}.ckpt")
        resume_trial = bool(
            resume and t in started_cfgs and os.path.exists(ckpt)
        )
        if resume_trial:
            cfg = started_cfgs[t]
        elif search == "tpe":
            cfg = suggest_tpe(search_space, results, rng)
        else:
            cfg = sample_space(search_space, rng)
        return {
            "trial": t, "config": cfg, "seed": seed, "stamp": stamp,
            "resume_trial": resume_trial,
            "data_path": data_path,
            # ship the in-memory dataset only when there's no path to load
            # from (worker processes reload via the npz cache instead)
            "dataset": (dataset if (data_path is None and not needs_reprocess)
                        else None),
            "needs_reprocess": needs_reprocess,
            "delete_processed": delete_processed,
            "report_every": report_every,
            "rung_checks": _rung_checks(rung_epochs, results),
            "checkpoint_path": ckpt,
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
        if rec.get("event") == "started":
            return
        if "best_val" in rec:
            print(f"Trial {rec['trial']}: val={rec['best_val']:.5f} "
                  f"config={rec['config']}")
        else:
            print(f"Trial {rec['trial']} FAILED: {rec['error']}")

    def record_start(p: dict):
        if not p["resume_trial"]:
            record({"trial": p["trial"], "config": p["config"],
                    "event": "started"})

    pending = [t for t in range(trials) if t not in done_ids]
    failures = 0

    if concurrency <= 1:
        # Pre-built dataset is reusable serially even when reprocessing is
        # off; avoid a per-trial reload.
        for t in pending:
            p = payload_for(t)
            if dataset is not None and not needs_reprocess:
                p["dataset"] = dataset
            record_start(p)
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
        # One device slot per in-flight trial; max_tasks_per_child=1 gives
        # every trial a fresh worker process so its device_env applies
        # before the backend initializes in that process.
        slots = list(range(concurrency))

        def device_env(slot: int) -> dict:
            env = {"MDL_TRIAL_SLOT": str(slot)}
            if tpu_backend and n_chips > 1:
                env["TPU_VISIBLE_CHIPS"] = str(slot)
            elif not tpu_backend:
                # CPU parent: workers must stay on CPU even when a TPU
                # plugin force-registers (it would serialize every worker
                # on — or crash — the one chip).
                import jax as _jax

                env["JAX_PLATFORMS"] = _jax.default_backend()
            return env

        with cf.ProcessPoolExecutor(
            max_workers=concurrency, mp_context=ctx, max_tasks_per_child=1
        ) as pool:
            running: dict = {}
            it = iter(pending)
            abort = None
            while True:
                while abort is None and len(running) < concurrency and slots:
                    t = next(it, None)
                    if t is None:
                        break
                    p = payload_for(t)
                    p["device_env"] = device_env(slots.pop(0))
                    record_start(p)
                    running[pool.submit(_execute_trial, p)] = p
                if not running:
                    break
                ready, _ = cf.wait(
                    list(running), return_when=cf.FIRST_COMPLETED
                )
                for fut in ready:
                    p = running.pop(fut)
                    slots.append(int(p["device_env"]["MDL_TRIAL_SLOT"]))
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
