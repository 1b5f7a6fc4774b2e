"""Op-level bench: dst-sorted CSR Pallas segment-reduce vs XLA scatter.

The r4 verdict's untried design for the latency-bound scatter
(BULK.md: packed CGCNN 2.6% MFU / 41% HBM, XLA scatter ~27 GB/s
effective). Measures, at packed-bin scale (110k edges → 8k nodes,
D=100) and at 4× that:

  * XLA segment_sum fwd / gather bwd (the incumbent packed path)
  * sorted_segment_sum fwd / bwd (ops/pallas_csr.py), te ∈ {256,512,1024}

Run on a TPU host: python bench_csr.py   (writes stdout JSON; results
recorded in KERNELS.md).
"""
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

from matdeeplearn_tpu.ops.pallas_csr import sorted_segment_sum


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _consume(x):
    return jax.lax.dot_general(x.ravel()[None], x.ravel()[None],
                               (((1,), (1,)), ((), ())))[0, 0]


def timeit(fn, *a, reps=30):
    float(fn(*a))  # compile + warmup (scalar sync; see bench_sorted_scatter)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    float(out)
    return (time.perf_counter() - t0) / reps


def make_sorted_graph(n_real, e_target, rng):
    """Hole-free sorted dst from a degree-~12 distribution + self-loops."""
    deg = rng.integers(6, 14, n_real)
    deg = np.maximum(deg, 1)
    dst = np.repeat(np.arange(n_real), deg).astype(np.int32)
    return dst[:e_target] if len(dst) >= e_target else dst


def main():
    log("devices:", jax.devices())
    recs = {}
    for scale, (E, N) in (("1x", (110_592, 8_192)),
                          ("4x", (442_368, 32_768))):
        D = 100
        rng = np.random.default_rng(0)
        dst = make_sorted_graph(N - 64, E - 4096, rng)
        e_real = len(dst)
        dstp = np.concatenate([dst, np.zeros(E - e_real, np.int32)])
        mask = np.zeros(E, np.float32)
        mask[:e_real] = 1.0
        msgs = rng.standard_normal((E, D)).astype(np.float32)

        mj = jax.device_put(jnp.asarray(msgs))
        dj = jax.device_put(jnp.asarray(dstp))
        kj = jax.device_put(jnp.asarray(mask))
        cot = jax.device_put(jnp.asarray(
            rng.standard_normal((N, D)).astype(np.float32)))

        # --- XLA incumbents ---------------------------------------------
        f_x = jax.jit(lambda m, i, k: _consume(jax.ops.segment_sum(
            m * k[:, None], i, num_segments=N)))
        t = timeit(f_x, mj, dj, kj)
        recs[f"{scale}_xla_fwd_ms"] = t * 1e3
        log(f"[{scale}] xla fwd       : {t*1e3:7.3f} ms")
        g_x = jax.jit(lambda c, i, k: _consume(
            jnp.take(c, i, axis=0) * k[:, None]))
        t = timeit(g_x, cot, dj, kj)
        recs[f"{scale}_xla_bwd_ms"] = t * 1e3
        log(f"[{scale}] xla bwd(gthr) : {t*1e3:7.3f} ms")
        fb_x = jax.jit(jax.grad(lambda m: _consume(jax.ops.segment_sum(
            m * kj[:, None], dj, num_segments=N))))
        t = timeit(lambda m: _consume(fb_x(m)), mj)
        recs[f"{scale}_xla_fwdbwd_ms"] = t * 1e3
        log(f"[{scale}] xla fwd+bwd   : {t*1e3:7.3f} ms")

        # --- CSR kernel --------------------------------------------------
        for te in (256, 512, 1024):
            f_k = jax.jit(lambda m, i, k, te=te: _consume(
                sorted_segment_sum(m, i, k, N, te, False, True)))
            t = timeit(f_k, mj, dj, kj)
            recs[f"{scale}_csr_te{te}_fwd_ms"] = t * 1e3
            log(f"[{scale}] csr te={te:<4} fwd: {t*1e3:7.3f} ms")
            fb_k = jax.jit(jax.grad(lambda m, te=te: _consume(
                sorted_segment_sum(m, dj, kj, N, te, False, True))))
            t = timeit(lambda m, fb=fb_k: _consume(fb(m)), mj)
            recs[f"{scale}_csr_te{te}_fwdbwd_ms"] = t * 1e3
            log(f"[{scale}] csr te={te:<4} f+b: {t*1e3:7.3f} ms")

        # numerics on device
        out_k = jax.jit(lambda m: sorted_segment_sum(
            m, dj, kj, N, 512, False, True))(mj)
        out_x = jax.jit(lambda m: jax.ops.segment_sum(
            m * kj[:, None], dj, num_segments=N))(mj)
        err = float(jnp.abs(out_k - out_x).max())
        recs[f"{scale}_max_abs_err"] = err
        log(f"[{scale}] device err vs XLA: {err:.2e}")

    print(json.dumps(recs))


if __name__ == "__main__":
    main()
