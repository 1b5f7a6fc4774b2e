"""MEGNet epoch decomposition (VERDICT r4 weak #3 / next #5).

MEGNet is the slowest non-MPNN model at 46k (14.3 s/epoch, 82 ms step,
1.7% MFU) with no breakdown. This script times, at the exact packed-bin
shapes, the model's component groups by ablation (stub one group, time
the full fwd+bwd, attribute the delta) plus isolated op timings:

  groups: src-side segment means | dst gather (gather_dst) | src gathers
          | u broadcasts | edge/node/global MLP stacks (the remainder)

Run on a TPU host: python bench_megnet_decomp.py [--n 2000]
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


def timeit(fn, *a, reps=20):
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
    from matdeeplearn_tpu.ops import aggregate as AGG
    from matdeeplearn_tpu.nn import conv as CONV

    ds = BB.build_corpus(args.n)
    nc, ec = ds.node_counts(), ds.edge_counts()
    spec = BatchSpec.packed_for_dataset(nc, ec, 256)
    mat = packed_id_matrix(np.arange(args.n), nc, ec, spec, 256, True, 0)
    mp = {"dim1": 100, "dim2": 100, "dim3": 100, "gc_fc_count": 2,
          "batch_size": 256}
    tx = build_optimizer("AdamW", 1e-3, {})
    model = build_model("MEGNet", ds, mp)
    dd = DeviceDataset.from_graph_dataset(ds)
    b = jax.jit(lambda ids: assemble_batch(dd, ids, spec))(jnp.asarray(mat[0]))
    state = T.init_state(model, tx, b, 0)

    def fwdbwd():
        def loss(p):
            out = model.apply(
                {"params": p, "batch_stats": state.batch_stats}, b,
                training=False)
            return jnp.sum(jnp.abs(out - b.y[:, 0]) * b.graph_mask)
        return jax.jit(jax.grad(loss))

    recs = {}
    base_t = timeit(fwdbwd(), state.params)
    recs["full_fwdbwd_ms"] = base_t * 1e3
    log(f"full fwd+bwd: {base_t*1e3:.2f} ms")

    # --- ablations: stub a component group, re-time, attribute the delta.
    # Stubs keep shapes/dtypes so the rest of the graph is unchanged.
    # (MEGNetBlock calls src_segment_mean/gather_dst since r5 — stub the
    # names it actually calls, or the ablation silently measures ~0.)
    real_sm = CONV.src_segment_mean
    real_gd = CONV.gather_dst

    def stub_sm(values, batch):
        return jnp.zeros((batch.num_nodes, values.shape[-1]), values.dtype)

    def stub_gd(x, batch):
        return jnp.zeros((batch.num_edges, x.shape[-1]), x.dtype)

    for name, attr, fn, real in (
        ("src_segment_means", "src_segment_mean", stub_sm, real_sm),
        ("dst_gather", "gather_dst", stub_gd, real_gd),
    ):
        setattr(CONV, attr, fn)
        try:
            t = timeit(fwdbwd(), state.params)
            recs[f"minus_{name}_ms"] = t * 1e3
            recs[f"attrib_{name}_ms"] = (base_t - t) * 1e3
            log(f"minus {name}: {t*1e3:.2f} ms  (attribution "
                f"{(base_t-t)*1e3:.2f} ms)")
        finally:
            setattr(CONV, attr, real)

    # node->graph pools + u broadcasts live inside the block; approximate
    # with isolated op timings at exact shapes:
    E, N, B = spec.num_edges, spec.num_nodes, spec.num_graphs
    e_out = jnp.ones((E, 100), jnp.float32)
    x = jnp.ones((N, 100), jnp.float32)
    src = b.edge_src

    def _c(v):
        return jax.lax.dot_general(v.ravel()[None], v.ravel()[None],
                                   (((1,), (1,)), ((), ())))[0, 0]

    f1 = jax.jit(lambda e_: _c(jax.ops.segment_sum(e_, src, num_segments=N)))
    recs["op_src_scatter_ms"] = timeit(f1, e_out) * 1e3
    f2 = jax.jit(lambda x_: _c(jnp.take(x_, src, axis=0)))
    recs["op_src_gather_ms"] = timeit(f2, x) * 1e3
    f3 = jax.jit(lambda x_: _c(jax.ops.segment_sum(
        x_, b.node_graph, num_segments=B + 1)))
    recs["op_node_pool_ms"] = timeit(f3, x) * 1e3
    u100 = jnp.ones((B, 100), jnp.float32)
    eg = b.node_graph[src]
    f4 = jax.jit(lambda u_: _c(jnp.take(u_, jnp.minimum(eg, B - 1), axis=0)))
    recs["op_u_broadcast_ms"] = timeit(f4, u100) * 1e3
    for k in ("op_src_scatter_ms", "op_src_gather_ms", "op_node_pool_ms",
              "op_u_broadcast_ms"):
        log(f"{k}: {recs[k]:.3f}")

    print(json.dumps({k: round(v, 3) for k, v in recs.items()}))


if __name__ == "__main__":
    main()
