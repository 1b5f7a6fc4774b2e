"""Pallas windowed MXU segment-sum vs XLA scatter on real TPU silicon
(VERDICT r1 next-round #3: the kernel had only interpret-mode coverage).

For edge counts 64k-4M at graph-realistic degree (~12) this times
  * the XLA scatter path (jax.ops.segment_sum), and
  * windowed_segment_sum at several (TW, TE) tilings,
forward and forward+backward, verifying numerics on device first.
Writes KERNELS.json with the measured crossover; jobs.py's auto-kernel
threshold is calibrated from this artifact when present.

Usage (on the TPU): python bench_kernels.py [--dim 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=100)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from matdeeplearn_tpu.ops.pallas_segment import (
        windowed_sizes,
        windowize_edges,
        windowed_segment_sum,
    )

    backend = jax.default_backend()
    interpret = backend != "tpu"
    log(f"backend={backend} interpret={interpret}")

    D = args.dim
    degree = 12
    results = []

    def timeit(fn, *a, reps):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    for e_target in (16_384, 32_768, 65_536, 262_144, 1_048_576, 4_194_304):
        n = e_target // degree
        rng = np.random.default_rng(0)
        # dst-sorted edges with ~uniform degree (windowed layout invariant)
        dst = np.sort(rng.integers(0, n, e_target)).astype(np.int32)
        msgs = rng.standard_normal((e_target, D)).astype(np.float32)
        mask = np.ones(e_target, np.float32)

        dstj = jnp.asarray(dst)
        msgsj = jnp.asarray(msgs)

        @jax.jit
        def xla_sum(m, d=dstj, nn=n):
            return jax.ops.segment_sum(m, d, num_segments=nn)

        t_xla = timeit(xla_sum, msgsj, reps=args.reps)
        want = None
        rec = {"edges": e_target, "nodes": n, "dim": D,
               "xla_scatter_ms": t_xla * 1e3, "windowed": []}

        @jax.jit
        def xla_grad(m):
            return jax.grad(lambda mm: xla_sum(mm).sum())(m)

        rec["xla_scatter_bwd_ms"] = timeit(xla_grad, msgsj, reps=args.reps) * 1e3

        for tw, te in ((256, 256), (512, 512), (1024, 512), (512, 1024)):
            nw, ew = windowed_sizes(n, e_target, tw, te)

            @jax.jit
            def make_we(d=dstj, m=jnp.asarray(mask), tw=tw, te=te):
                return windowize_edges(d, m, n, tw, te)

            we = jax.block_until_ready(make_we())
            wmsgs = jnp.asarray(msgs)[jnp.maximum(we.order, 0)]

            fwd = jax.jit(
                lambda m, we=we, tw=tw, te=te: windowed_segment_sum(
                    m, we, n, tw, te, interpret
                )
            )
            got = jax.block_until_ready(fwd(wmsgs))
            if want is None:
                want = jax.block_until_ready(xla_sum(msgsj))
            err = float(jnp.max(jnp.abs(got - want)))
            scale = float(jnp.max(jnp.abs(want))) or 1.0
            ok = err <= 1e-3 * scale
            t_fwd = timeit(fwd, wmsgs, reps=args.reps)

            bwd = jax.jit(
                lambda m, we=we, tw=tw, te=te: jax.grad(
                    lambda mm: windowed_segment_sum(
                        mm, we, n, tw, te, interpret
                    ).sum()
                )(m)
            )
            t_bwd = timeit(bwd, wmsgs, reps=args.reps)

            rec["windowed"].append({
                "tw": tw, "te": te, "ew": ew,
                "fwd_ms": t_fwd * 1e3, "bwd_ms": t_bwd * 1e3,
                "numerics_ok": bool(ok), "max_err": err,
                "speedup_fwd": t_xla / t_fwd,
            })
            log(f"E={e_target:>8} tw={tw} te={te}: xla {t_xla*1e3:7.2f} ms, "
                f"pallas fwd {t_fwd*1e3:7.2f} ms (x{t_xla/t_fwd:4.2f}), "
                f"bwd {t_bwd*1e3:7.2f} ms, ok={ok} err={err:.2e}")
        results.append(rec)

    best_speedups = {
        r["edges"]: max(
            [w["speedup_fwd"] for w in r["windowed"] if w["numerics_ok"]],
            default=0.0,
        )
        for r in results if r["windowed"]
    }
    crossover = None
    for e in sorted(best_speedups):
        if best_speedups[e] > 1.0:
            crossover = e
            break
    payload = {
        "backend": backend, "dim": D, "degree": degree,
        "results": results,
        "best_speedup_by_edges": best_speedups,
        "crossover_edges": crossover,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "KERNELS.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    log(f"wrote {path}; crossover={crossover}")
    print(json.dumps({"metric": "pallas_best_speedup_1M_edges",
                      "value": round(best_speedups.get(1_048_576, 0.0), 3),
                      "unit": "x_vs_xla_scatter"}))


if __name__ == "__main__":
    main()
