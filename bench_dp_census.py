"""Compiled-HLO collective census of the packed dp-SPMD train step.

BULK.md's multi-chip projection (bf16-packed headline / N chips) rests on
SCALING.md's measured ≤2% packed partition overhead, leaving "ICI
gradient psum" as the only unmeasured term. This script bounds that term
with the same technique SCALING.md used for ring-vs-gspmd: compile the
dp=8 packed CGCNN train step on a virtual 8-device mesh, enumerate every
collective in the optimized HLO with result shapes, and convert bytes
to a time bound under an explicit ICI-bandwidth assumption.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python bench_dp_census.py
Writes stdout JSON; the derived bound is recorded in SCALING.md/BULK.md.
"""

import json
import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# the axon sitecustomize in this image force-selects the TPU platform
# regardless of JAX_PLATFORMS; pin cpu before the first backend touch
# (same workaround as __graft_entry__.dryrun_multichip)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f16": 2, "s64": 8, "u64": 8, "f64": 8, "u8": 1, "s8": 1}

# v5e ICI: 1,600 Gbps per chip (Google Cloud spec) = 200 GB/s aggregate
# bidirectional; a bidirectional-ring all-reduce of S bytes on N chips
# moves ~2·S·(N-1)/N per link-direction, with per-direction bandwidth
# ~50 GB/s on the 2D-torus links. Stated as an assumption, not a
# measurement — this environment has one chip.
ICI_GBPS_PER_DIRECTION = 50.0


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def census(hlo_text: str):
    counts, bytes_ = {}, {}
    for line in hlo_text.splitlines():
        m = re.search(
            r"=\s+((?:\([^)]*\)|\S+))\s+(all-reduce|all-gather|"
            r"reduce-scatter|collective-permute|all-to-all)\(", line)
        if not m:
            continue
        shapes, op = m.group(1), m.group(2)
        total = sum(shape_bytes(s)
                    for s in re.findall(r"\w+\[[\d,]*\]", shapes))
        counts[op] = counts.get(op, 0) + 1
        bytes_[op] = bytes_.get(op, 0) + total
    return counts, bytes_


def main():
    from matdeeplearn_tpu.data.batching import BatchSpec
    from matdeeplearn_tpu.models import build_model
    from matdeeplearn_tpu.parallel import make_mesh, make_spmd_train_step
    from matdeeplearn_tpu.training.optimizers import build_optimizer
    from matdeeplearn_tpu.training import train as T
    import __graft_entry__ as GE

    ds = GE._synthetic_dataset(num_graphs=64, max_atoms=12)
    dp = 8
    mesh = make_mesh(dp=dp, ep=1)
    # Per-replica spec with the 46k packed-bin SHAPE (B=385, N=9264,
    # E=119888 — the resolved line of the headline config). Collective
    # sizes depend on these shapes + the param count, not on the data.
    spec = BatchSpec(385, 9264, 119888)
    model = build_model("CGCNN", ds, {"dim1": 100, "dim2": 150,
                                      "gc_count": 4, "batch_size": 256})
    tx = build_optimizer("AdamW", 1e-3, {})
    step, ids_sharding, rep = make_spmd_train_step(
        model, tx, "l1_loss", spec, mesh)

    from matdeeplearn_tpu.data.batching import DeviceDataset, assemble_batch

    dd = DeviceDataset.from_graph_dataset(ds)
    sample = assemble_batch(dd, jnp.arange(spec.num_graphs, dtype=jnp.int32),
                            spec)
    state = T.init_state(model, tx, sample, 0)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    ids = jnp.zeros((dp * spec.num_graphs,), jnp.int32)
    ids = jax.device_put(ids, ids_sharding)
    state = jax.device_put(state, rep)
    lowered = step.lower(state, dd, ids, jax.random.PRNGKey(0))
    txt = lowered.compile().as_text()
    counts, bytes_ = census(txt)
    total_bytes = sum(bytes_.values())
    # ring all-reduce on N chips: ~2·S·(N-1)/N per link-direction
    wire = 2 * total_bytes * (dp - 1) / dp
    t_ms = wire / (ICI_GBPS_PER_DIRECTION * 1e9) * 1e3
    out = {
        "dp": dp,
        "n_params": int(n_params),
        "collective_counts": counts,
        "collective_bytes": {k: int(v) for k, v in bytes_.items()},
        "total_collective_bytes": int(total_bytes),
        "ring_wire_bytes_per_link_dir": int(wire),
        "ici_gbps_per_direction_assumed": ICI_GBPS_PER_DIRECTION,
        "derived_bound_ms_per_step": round(t_ms, 4),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
