"""Where does the headline step go? CGCNN packed·csr·bf16 decomposition.

The 46k headline (4.65 s/epoch = 774 epochs/hr, 122 bins) means
~38 ms/step wall including host work. This times, at the exact
packed-bin shapes on one chip: model fwd, fwd+bwd, batch assembly,
optimizer update, and the composed step — so the residual (scan/host
overheads) is explicit. Run: python bench_step_decomp.py [--n 2000]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *a, reps=30):
    r = fn(*a)
    x = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(x).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*a)
    x = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(x).astype(jnp.float32))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    args = ap.parse_args()

    import bench_bulk as BB
    from matdeeplearn_tpu.data.batching import (
        BatchSpec, DeviceDataset, assemble_batch, packed_id_matrix)
    from matdeeplearn_tpu.models import build_model
    from matdeeplearn_tpu.training import train as T
    from matdeeplearn_tpu.training.optimizers import build_optimizer

    ds = BB.build_corpus(args.n)
    nc, ec = ds.node_counts(), ds.edge_counts()
    spec = BatchSpec.packed_for_dataset(nc, ec, 256)
    mat = packed_id_matrix(np.arange(args.n), nc, ec, spec, 256, True, 0)
    mp = {"dim1": 100, "dim2": 150, "gc_count": 4, "post_fc_count": 3,
          "batch_size": 256, "precision": "bf16"}
    tx = build_optimizer("AdamW", 1e-3, {})
    dd = DeviceDataset.from_graph_dataset(ds, edge_order="dst")
    ids = jnp.asarray(mat[0])
    asm = jax.jit(lambda i: assemble_batch(dd, i, spec))
    b = asm(ids)
    model = build_model("CGCNN", ds, mp)
    state = T.init_state(model, tx, b, 0)
    recs = {}

    recs["assembly_ms"] = timeit(asm, ids) * 1e3
    fwd = jax.jit(lambda p, bb: model.apply(
        {"params": p, "batch_stats": state.batch_stats}, bb,
        training=False))
    recs["fwd_ms"] = timeit(fwd, state.params, b) * 1e3

    def loss(p, bb):
        out = model.apply({"params": p, "batch_stats": state.batch_stats},
                          bb, training=False)
        return jnp.sum(jnp.abs(out - bb.y[:, 0]) * bb.graph_mask)

    gradf = jax.jit(jax.grad(loss))
    recs["fwdbwd_ms"] = timeit(gradf, state.params, b) * 1e3
    g = gradf(state.params, b)
    upd = jax.jit(lambda gg, st: tx.update(gg, st.opt_state, st.params))
    recs["optimizer_ms"] = timeit(upd, g, state) * 1e3

    # composed: assembly + fwd+bwd + update in ONE jit (what the scan body
    # runs per step, minus scheduler/loss bookkeeping)
    def step(st, i):
        bb = assemble_batch(dd, i, spec)
        gg = jax.grad(loss)(st.params, bb)
        updates, new_opt = tx.update(gg, st.opt_state, st.params)
        new_p = jax.tree.map(lambda p, u: p + u, st.params, updates)
        return st.replace(params=new_p, opt_state=new_opt)

    stepj = jax.jit(step, donate_argnums=0)
    import copy
    t = timeit(lambda i: stepj(T.init_state(model, tx, b, 0), i), ids,
               reps=10)
    # donation complicates reps; time without donation too
    stepj2 = jax.jit(step)
    recs["composed_step_ms"] = timeit(stepj2, state, ids) * 1e3
    log(json.dumps({k: round(v, 2) for k, v in recs.items()}))
    print(json.dumps({k: round(v, 3) for k, v in recs.items()}))


if __name__ == "__main__":
    main()
