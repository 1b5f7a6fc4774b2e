"""Bulk-scale north star: epochs/hr on a bulk_data-sized corpus.

The reference's flagship dataset is 46,744 Materials Project structures
(formation energy; /root/reference/data/bulk_data/mp-ids-46744.csv,
data/README.md:5). The MP API is unreachable from this environment, so the
corpus here is synthetic at the same scale with an MP-like size skew
(lognormal atom counts, median ~28, tail to 250) built through the real
featurizer — the workload shape (graph sizes, degree, feature widths) is
what throughput depends on, not the target values.

Measures CGCNN (demo config) on one TPU chip across the r2-verdict matrix:

  * in-memory  x padded   (kernel=auto -> fused Pallas CGConv)
  * in-memory  x padded   (kernel=xla — the fused-vs-XLA anchor at scale)
  * in-memory  x packed   (budget-packed batches)
  * in-memory  x padded   (precision=bf16)
  * streaming  x padded   (dataset_type "large" path: host-assembled
                           batches; also profiles host assembly vs device
                           step so starvation is measurable)

Writes BULK.json (one record per config: s/epoch, epochs/hr, edges/s/chip,
MFU/HBM utilization from the XLA cost model) — the summary table lives in
BULK.md. Corpus and its windowed layout are cached under datasets/bulk_cache/
(gitignored; ~1.2 GB).

Usage: python bench_bulk.py [--n 46744] [--epochs 3] [--configs all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "datasets", "bulk_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_corpus(n: int, seed: int = 0):
    """46k-scale GraphDataset with MP-like size skew, disk-cached."""
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"bulk_{n}_{seed}.npz")
    from matdeeplearn_tpu.data.dataset import GraphDataset

    if os.path.exists(path):
        log(f"corpus cache hit: {path}")
        d = np.load(path, allow_pickle=False)
        return GraphDataset(
            node_x=d["node_x"], node_z=d["node_z"], edge_src=d["edge_src"],
            edge_dst=d["edge_dst"], edge_weight=d["edge_weight"],
            edge_dist_norm=d["edge_dist_norm"], node_ptr=d["node_ptr"],
            edge_ptr=d["edge_ptr"], y=d["y"], u=d["u"],
            structure_ids=[str(i) for i in range(len(d["y"]))],
            cache_dir=CACHE,  # windowed layouts disk-cache next to the corpus
        )

    from matdeeplearn_tpu.data import graphs as G
    from matdeeplearn_tpu.data.structures import Structure

    rng = np.random.default_rng(seed)
    # MP-like skew: lognormal, median ~28 atoms, clipped [8, 250].
    sizes = np.clip(
        np.round(np.exp(rng.normal(np.log(28.0), 0.55, n))), 8, 250
    ).astype(int)
    log(f"building {n} structures: median {np.median(sizes):.0f} atoms, "
        f"p95 {np.percentile(sizes, 95):.0f}, max {sizes.max()}")
    atom_dict = G.default_atom_dictionary()
    all_src, all_dst, all_dist, xs, zs = [], [], [], [], []
    t0 = time.time()
    for i, na in enumerate(sizes):
        cell = np.eye(3) * max(7.0, 2.2 * na ** (1.0 / 3.0) * 1.6)
        s = Structure(rng.integers(1, 90, na), rng.random((na, 3)) @ cell,
                      cell, np.ones(3, bool), str(i))
        src, dst, dist = G.build_graph(s, radius=8.0, max_neighbors=12)
        all_src.append(src)
        all_dst.append(dst)
        all_dist.append(dist)
        base = G.node_features(s.numbers, atom_dict)
        deg = G.one_hot_degree(src, na, 13)
        xs.append(np.concatenate([base, deg], axis=1).astype(np.float32))
        zs.append(s.numbers)
        if (i + 1) % 5000 == 0:
            log(f"  {i + 1}/{n} ({time.time() - t0:.0f}s)")
    normed, _, _ = G.normalize_edges(all_dist)
    node_ptr = np.concatenate([[0], np.cumsum(sizes)])
    edge_ptr = np.concatenate([[0], np.cumsum([len(e) for e in all_src])])
    arrays = dict(
        node_x=np.concatenate(xs).astype(np.float32),
        node_z=np.concatenate(zs).astype(np.int32),
        edge_src=np.concatenate(all_src).astype(np.int32),
        edge_dst=np.concatenate(all_dst).astype(np.int32),
        edge_weight=np.concatenate(all_dist).astype(np.float32),
        edge_dist_norm=np.concatenate(normed).astype(np.float32),
        node_ptr=node_ptr.astype(np.int64),
        edge_ptr=edge_ptr.astype(np.int64),
        y=rng.standard_normal((n, 1)).astype(np.float32),
        u=np.zeros((n, 3), np.float32),
    )
    np.savez(path, **arrays)
    log(f"corpus built in {time.time() - t0:.0f}s -> {path}")
    return GraphDataset(structure_ids=[str(i) for i in range(n)],
                        cache_dir=CACHE, **arrays)


MODEL = {"model": "CGCNN", "dim1": 100, "dim2": 150, "pre_fc_count": 1,
         "gc_count": 4, "post_fc_count": 3, "pool": "global_mean_pool",
         "batch_norm": "True", "act": "relu", "lr": 0.002,
         "optimizer": "AdamW", "scheduler": "ReduceLROnPlateau"}


def run_config(name, ds, extra, tr, va, batch, epochs, stream_dir=None):
    import jax

    from matdeeplearn_tpu.training import jobs as J
    from matdeeplearn_tpu.utils.profiling import (
        ThroughputMeter,
        attach_analytic_flops,
    )

    dataset = ds
    if stream_dir is not None:
        from matdeeplearn_tpu.data.streaming import load_or_create_sharded

        dataset = load_or_create_sharded(ds, stream_dir)
    mp = {**MODEL, "batch_size": batch, "epochs": epochs, **extra}
    t0 = time.time()
    run = J.setup_run(dataset, mp, "l1_loss", seed=7, print_model=False)
    setup_s = time.time() - t0
    meter = ThroughputMeter(
        num_devices=1,
        edges_per_epoch=float(np.asarray(ds.edge_counts())[tr].sum()),
        graphs_per_epoch=float(len(tr)),
    )
    attach_analytic_flops(
        meter, run.model_name, run.model_config, run.spec,
        len(tr), len(va), batch,
        fused_kernel=run.kernel_mode == "fused",
        steps_per_epoch=(run.id_matrix_fn(tr, True, 7).shape[0]
                         if run.id_matrix_fn is not None else None),
    )
    # Warmup with the SAME chunk length as the timed run — chunk length is
    # baked into the scanned program shape, so a different-k warmup would
    # leave the timed chunk paying compile/cache-load.
    t0 = time.time()
    _, last, _ = J.run_fused_training(
        run, train_idx=tr, val_idx=va, epochs=epochs, verbosity=epochs,
        seed=7, meter=meter,
    )
    jax.block_until_ready(last.params)
    warm_s = time.time() - t0
    run.state = last
    t0 = time.time()
    _, last, _ = J.run_fused_training(
        run, train_idx=tr, val_idx=va, epochs=epochs, verbosity=epochs,
        seed=8, meter=meter,
    )
    jax.block_until_ready(last.params)
    sec_per_epoch = (time.time() - t0) / epochs
    # Direct accounting from the timed span (no meter heuristics): real
    # train edges per epoch over measured wall; MFU from the analytic FLOP
    # model (profiling.analytic_step_flops) vs the chip's bf16 peak.
    from matdeeplearn_tpu.utils.profiling import device_peaks

    train_edges = float(np.asarray(ds.edge_counts())[tr].sum())
    steps = (run.id_matrix_fn(tr, True, 7).shape[0]
             if run.id_matrix_fn is not None else -(-len(tr) // batch))
    flops_epoch = meter.flops_per_epoch  # analytic (attach_analytic_flops)
    bytes_epoch = meter.bytes_per_epoch
    peaks = device_peaks()
    rec = {
        "config": name, "s_per_epoch": round(sec_per_epoch, 3),
        "epochs_per_hr": round(3600.0 / sec_per_epoch, 1),
        "edges_per_s_per_chip": round(train_edges / sec_per_epoch),
        "graphs_per_s": round(len(tr) / sec_per_epoch, 1),
        "step_ms": round(sec_per_epoch / steps * 1e3, 2),
        "model_flops_per_s": round(flops_epoch / sec_per_epoch),
        "setup_s": round(setup_s, 1), "warmup_s": round(warm_s, 1),
        "kernel_mode": run.kernel_mode,
    }
    if peaks is not None and flops_epoch > 0:
        rec["mfu_pct"] = round(
            100.0 * flops_epoch / sec_per_epoch / peaks[0], 2
        )
    if peaks is not None and bytes_epoch > 0:
        # Analytic HBM traffic vs the chip peak (VERDICT r3 missing #5):
        # single-digit here AND single-digit MFU = latency-bound, not
        # bandwidth-bound.
        rec["hbm_util_pct"] = round(
            100.0 * bytes_epoch / sec_per_epoch / peaks[1], 2
        )
    if stream_dir is not None:
        # Host-assembly profile: can the host feed the chip? Uses the same
        # shard-local order training uses (random ids would measure LRU
        # decompression thrash, not the hot path).
        sds = run.streaming if run.streaming is not None else dataset
        spec = run.spec
        order = sds.shard_local_order(np.asarray(tr), seed=123)
        ids = order[: batch * 8].reshape(8, batch)
        t0 = time.time()
        for row in ids:
            sds.assemble(row, spec)
        rec["stream_assembly_ms_per_batch"] = round(
            (time.time() - t0) / 8 * 1e3, 2
        )
    log(f"{name}: {json.dumps(rec)}")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=46744)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--configs", default="all",
                    help="comma list: fused,xla,packed,bf16,stream")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log("devices:", jax.devices())

    ds = build_corpus(args.n)
    ec = np.asarray(ds.edge_counts())
    log(f"corpus: {len(ds)} graphs, {ec.sum():,} edges, "
        f"mean {ec.mean():.0f} edges/graph")
    idx = np.arange(len(ds), dtype=np.int64)
    rng = np.random.default_rng(0)
    rng.shuffle(idx)
    n_tr = int(0.95 * len(idx))
    tr, va = idx[:n_tr], idx[n_tr:]

    # Padded batches at MP-size skew must stay small: BatchSpec.for_dataset
    # sizes every batch for the B LARGEST graphs (64k nodes / 837k edge
    # slots at B=256 on this corpus — backward residuals then overflow the
    # chip). Packed batching exists precisely for this skew and runs the
    # full 256. Measured finding, recorded in BULK.md.
    wanted = (args.configs.split(",") if args.configs != "all"
              else ["fused", "xla", "packed", "bf16", "stream"])
    recs = []
    for name in wanted:
        extra, sdir, batch = {}, None, min(args.batch, 64)
        if name == "fused":
            extra = {"kernel": "auto"}
        elif name == "xla":
            extra = {"kernel": "xla"}
        elif name == "packed":
            extra = {"kernel": "xla", "batching": "packed"}
            batch = args.batch
        elif name == "packed-csr":
            extra = {"kernel": "csr", "batching": "packed"}
            batch = args.batch
        elif name == "bf16-packed-csr":
            extra = {"kernel": "csr", "batching": "packed",
                     "precision": "bf16", "kernel_precision": "bf16"}
            batch = args.batch
        elif name == "gcn-packed-csr":
            extra = {"model": "GCN", "dim1": 100, "dim2": 150,
                     "kernel": "csr", "batching": "packed"}
            batch = args.batch
        elif name == "mpnn-packed-csr":
            extra = {"model": "MPNN", "dim1": 100, "dim2": 100,
                     "dim3": 100, "kernel": "csr", "batching": "packed"}
            batch = args.batch
        elif name == "schnet-packed-csr":
            extra = {"model": "SchNet", "dim3": 150, "cutoff": 8.0,
                     "kernel": "csr", "batching": "packed"}
            batch = args.batch
        elif name == "megnet-packed-csr":
            # csr_order defaults to "src" for MEGNet (_resolve_kernel)
            extra = {"model": "MEGNet", "dim1": 100, "dim2": 100,
                     "dim3": 100, "gc_fc_count": 2, "kernel": "csr",
                     "batching": "packed"}
            batch = args.batch
        elif name == "megnet-packed-csr-dst":
            # dst-order control arm for the src-vs-dst A/B
            extra = {"model": "MEGNet", "dim1": 100, "dim2": 100,
                     "dim3": 100, "gc_fc_count": 2, "kernel": "csr",
                     "batching": "packed", "csr_order": "dst"}
            batch = args.batch
        elif name == "packed-fused":
            extra = {"kernel": "fused", "batching": "packed"}
            batch = args.batch
        elif name == "bf16":
            extra = {"kernel": "xla", "precision": "bf16"}
        elif name == "bf16-packed":
            extra = {"kernel": "xla", "batching": "packed",
                     "precision": "bf16"}
            batch = args.batch
        elif name == "bf16-packed-fused":
            extra = {"kernel": "fused", "batching": "packed",
                     "precision": "bf16"}
            batch = args.batch
        elif name == "mpnn-xla":
            extra = {"model": "MPNN", "dim1": 100, "dim2": 100,
                     "dim3": 100, "kernel": "xla"}
        elif name == "mpnn-packed":
            extra = {"model": "MPNN", "dim1": 100, "dim2": 100,
                     "dim3": 100, "kernel": "xla", "batching": "packed"}
            batch = args.batch
        elif name == "mpnn-packed-fused":
            # NNConv bilinear message through the Pallas VMEM kernel
            extra = {"model": "MPNN", "dim1": 100, "dim2": 100,
                     "dim3": 100, "kernel": "fused", "batching": "packed"}
            batch = args.batch
        elif name == "mpnn-packed-fused-bf16":
            extra = {"model": "MPNN", "dim1": 100, "dim2": 100,
                     "dim3": 100, "kernel": "fused", "batching": "packed",
                     "precision": "bf16"}
            batch = args.batch
        elif name == "megnet-packed":
            extra = {"model": "MEGNet", "dim1": 100, "dim2": 100,
                     "dim3": 100, "gc_fc_count": 2, "kernel": "xla",
                     "batching": "packed"}
            batch = args.batch
        elif name == "gcn-packed":
            extra = {"model": "GCN", "dim1": 100, "dim2": 150,
                     "kernel": "xla", "batching": "packed"}
            batch = args.batch
        elif name == "schnet-packed":
            extra = {"model": "SchNet", "dim3": 150, "cutoff": 8.0,
                     "kernel": "xla", "batching": "packed"}
            batch = args.batch
        elif name == "schnet-xla":
            extra = {"model": "SchNet", "dim3": 150, "cutoff": 8.0,
                     "kernel": "xla"}
        elif name == "schnet-fused":
            extra = {"model": "SchNet", "dim3": 150, "cutoff": 8.0,
                     "kernel": "fused"}
        elif name == "schnet-packed-fused":
            extra = {"model": "SchNet", "dim3": 150, "cutoff": 8.0,
                     "kernel": "fused", "batching": "packed"}
            batch = args.batch
        elif name == "stream":
            extra = {"kernel": "xla"}
            sdir = os.path.join(CACHE, f"shards_{args.n}")
        elif name == "stream-packed":
            extra = {"kernel": "xla", "batching": "packed"}
            batch = args.batch
            sdir = os.path.join(CACHE, f"shards_{args.n}")
        elif name == "stream-packed-nowire":
            # wire-format ablation arm: full f32/i32 H2D payload
            extra = {"kernel": "xla", "batching": "packed",
                     "stream_wire": "False"}
            batch = args.batch
            sdir = os.path.join(CACHE, f"shards_{args.n}")
        label = "/".join(filter(None, [
            "streaming" if sdir else "in-memory",
            extra.get("model", "CGCNN"),
            extra.get("batching", "padded"),
            extra.get("kernel"),
            "bf16" if extra.get("precision") == "bf16" else None,
            "nowire" if extra.get("stream_wire") == "False" else None,
            extra.get("csr_order"),
            f"b{batch}",
        ]))
        try:
            recs.append(run_config(
                label, ds, extra, tr, va, batch, args.epochs, stream_dir=sdir,
            ))
        except Exception as e:
            import traceback

            log(f"config {name} FAILED: {e}\n{traceback.format_exc()}")
            recs.append({"config": name, "error": repr(e)})

    # Merge-by-label into the existing BULK.json: the crash-safe protocol is
    # one config per process (axon tunnel instability, BULK.md), so each
    # invocation must not wipe the other configs' records. Small-scale
    # (--n) debug runs only print — config labels collide across scales
    # and must not replace the 46k headline records.
    if args.n < 40000:
        print(json.dumps({"n_structures": args.n, "records": recs}))
        return
    path = os.path.join(REPO, "BULK.json")
    out = {"n_structures": args.n, "batch": args.batch,
           "epochs_timed": args.epochs,
           "total_edges": int(ec.sum()), "records": recs}
    if os.path.exists(path):
        try:
            prev = json.load(open(path))
            new_labels = {r.get("config") for r in recs}
            kept = [r for r in prev.get("records", [])
                    if r.get("config") not in new_labels]
            out["records"] = kept + recs
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
