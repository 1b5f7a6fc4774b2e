"""Op-level probe: does a dst-sorted edge layout (+ indices_are_sorted)
speed up XLA's TPU segment-sum scatter at bulk-bin scale?

The r4 roofline verdict says the packed path is gather/scatter-latency
bound (BULK.md); the remaining untried layout fix from the r3 verdict is
dst-sorted edges. Four combos: {unsorted, sorted data} × {flag off, on},
plus the x[src] gather with sorted/unsorted src. Run on a TPU host:

    python bench_sorted_scatter.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _consume(x):
    # vdot defeats algebraic simplification of sum-of-scatter
    return jax.lax.dot_general(x.ravel()[None], x.ravel()[None],
                               (((1,), (1,)), ((), ())))[0, 0]


def timeit(fn, *a, reps=30):
    # `fn` must be jitted and return a device SCALAR: block_until_ready
    # returns early through the axon tunnel (BULK.md), so the only reliable
    # sync is float() on a scalar; device execution is in-order, so syncing
    # the last rep's scalar bounds the whole queue.
    float(fn(*a))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    float(out)
    return (time.perf_counter() - t0) / reps


def main():
    # packed-bin scale: ~110k edges, ~8k nodes, D=100 (CGCNN demo width)
    E, N, D = 110_592, 8_192, 100
    rng = np.random.default_rng(0)
    dst_unsorted = rng.integers(0, N, E).astype(np.int32)
    dst_sorted = np.sort(dst_unsorted)
    msgs = rng.standard_normal((E, D)).astype(np.float32)

    mj = jax.device_put(msgs)
    recs = {}
    for name, idx, flag in (
        ("unsorted", dst_unsorted, False),
        ("unsorted_flag", dst_unsorted, True),   # flag is a PROMISE — only
                                                 # timing matters, output junk
        ("sorted", dst_sorted, False),
        ("sorted_flag", dst_sorted, True),
    ):
        ij = jax.device_put(idx)
        f = jax.jit(lambda m, i, flag=flag: _consume(jax.ops.segment_sum(
            m, i, num_segments=N, indices_are_sorted=flag)))
        t = timeit(f, mj, ij)
        recs[f"scatter_{name}_ms"] = t * 1e3
        log(f"scatter {name:>14}: {t*1e3:7.3f} ms")

    # the x[src] gather side
    x = jax.device_put(rng.standard_normal((N, D)).astype(np.float32))
    for name, idx in (("unsorted", dst_unsorted), ("sorted", dst_sorted)):
        ij = jax.device_put(idx)
        g = jax.jit(lambda xx, i: _consume(jnp.take(xx, i, axis=0)))
        t = timeit(g, x, ij)
        recs[f"gather_{name}_ms"] = t * 1e3
        log(f"gather  {name:>14}: {t*1e3:7.3f} ms")

    print(json.dumps(recs))


if __name__ == "__main__":
    main()
