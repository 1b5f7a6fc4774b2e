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


def _best_speedups(results):
    return {
        r["edges"]: max(
            [w["speedup_fwd"] for w in r["windowed"] if w["numerics_ok"]],
            default=0.0,
        )
        for r in results if r["windowed"]
    }


def _write_payload(results, backend, dim, degree):
    """Write KERNELS.json incrementally (after each size) so a crash or
    timeout still leaves the measured prefix on disk."""
    best_speedups = _best_speedups(results)
    crossover = None
    for e in sorted(best_speedups):
        if best_speedups[e] > 1.0:
            crossover = e
            break
    payload = {
        "backend": backend, "dim": dim, "degree": degree,
        "results": results,
        "best_speedup_by_edges": best_speedups,
        "crossover_edges": crossover,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "KERNELS.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    return crossover


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

    # NOTE: under the axon tunnel every *eager* op round-trips through a
    # network proxy — all data prep must run inside jit, with host->device
    # transfers done once per size.
    for e_target in (8_192, 16_384, 32_768, 65_536, 262_144, 1_048_576):
        n = e_target // degree
        rng = np.random.default_rng(0)
        # dst-sorted edges with ~uniform degree (windowed layout invariant)
        dst = np.sort(rng.integers(0, n, e_target)).astype(np.int32)
        msgs = rng.standard_normal((e_target, D)).astype(np.float32)
        mask = np.ones(e_target, np.float32)

        dstj = jax.device_put(dst)
        msgsj = jax.device_put(msgs)
        maskj = jax.device_put(mask)

        # NB: pass device arrays as ARGUMENTS, never as closure/default-arg
        # captures — captured arrays become jaxpr constants shipped inside
        # the remote-compile request (HTTP 413 at 1M edges x dim 100).
        xla_sum_fn = jax.jit(
            lambda m, d: jax.ops.segment_sum(m, d, num_segments=n),
            static_argnames=(),
        )
        xla_sum = lambda m: xla_sum_fn(m, dstj)

        t_xla = timeit(xla_sum, msgsj, reps=args.reps)
        want = jax.block_until_ready(xla_sum(msgsj))
        rec = {"edges": e_target, "nodes": n, "dim": D,
               "xla_scatter_ms": t_xla * 1e3, "windowed": []}
        log(f"E={e_target:>8}: xla fwd {t_xla*1e3:7.2f} ms")

        xla_grad_fn = jax.jit(
            lambda m, d: jax.grad(
                lambda mm: jax.ops.segment_sum(mm, d, num_segments=n).sum()
            )(m)
        )
        rec["xla_scatter_bwd_ms"] = timeit(
            lambda m: xla_grad_fn(m, dstj), msgsj, reps=args.reps
        ) * 1e3

        for tw, te in ((512, 512), (1024, 512)):
            nw, ew = windowed_sizes(n, e_target, tw, te)

            prep = jax.jit(
                lambda d, m, msg, tw=tw, te=te: (
                    lambda we: (we, msg[jnp.maximum(we.order, 0)])
                )(windowize_edges(d, m, n, tw, te))
            )
            we, wmsgs = jax.block_until_ready(prep(dstj, maskj, msgsj))

            fwd_fn = jax.jit(
                lambda m, we, tw=tw, te=te: windowed_segment_sum(
                    m, we, n, tw, te, interpret
                )
            )
            fwd = lambda m: fwd_fn(m, we)
            got = fwd(wmsgs)

            @jax.jit
            def check(a, b):
                scale = jnp.maximum(jnp.max(jnp.abs(b)), 1.0)
                return jnp.max(jnp.abs(a - b)), scale

            err_d, scale_d = jax.block_until_ready(check(got, want))
            err, scale = float(err_d), float(scale_d)
            ok = err <= 1e-3 * scale
            t_fwd = timeit(fwd, wmsgs, reps=args.reps)

            bwd_fn = jax.jit(
                lambda m, we, tw=tw, te=te: jax.grad(
                    lambda mm: windowed_segment_sum(
                        mm, we, n, tw, te, interpret
                    ).sum()
                )(m)
            )
            t_bwd = timeit(lambda m: bwd_fn(m, we), wmsgs, reps=args.reps)

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
        crossover = _write_payload(results, backend, D, degree)

    log(f"done; crossover={crossover}")
    best_speedups = _best_speedups(results)
    print(json.dumps({"metric": "pallas_best_speedup_1M_edges",
                      "value": round(best_speedups.get(1_048_576, 0.0), 3),
                      "unit": "x_vs_xla_scatter"}))


if __name__ == "__main__":
    main()
