"""Prototype: chunked-contraction restructure of the fused NNConv
bilinear kernel (fwd only) — measured experiment for the next kernel
iteration.

The production kernel (ops/pallas_bilinear.py) runs H sequential
(TE, D) @ (D, K) matmuls per tile — 100-deep contractions whose MXU
pipeline fill bounds it at ~17% of bf16 peak. This prototype fuses G
hidden units per step into one (TE, G·D) @ (G·D, K) matmul:

    X_c[:, g·D + d] = a[:, cG+g] · xj[:, d]   (lane-expanded outer product)
    acc += X_c @ vstack(W1[cG+g] for g in 0..G)

X_c is built on the MXU too: a_chunk @ S with S[g, g·D+d] = 1 (a one-hot
lane-expansion matmul, ~8% flop overhead), times pltpu.repeat(xj, G).
Same math, H/G-deep loop instead of H.

Run on a TPU host: python bench_bilinear_v2.py
"""
import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from matdeeplearn_tpu.ops.pallas_bilinear import (
    _reference_compose,
    fused_bilinear_msg,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _consume(x):
    f = x.ravel()[None]
    return jax.lax.dot_general(f, f, (((1,), (1,)), ((), ())))[0, 0]


def timeit(fn, *a, reps=20):
    float(fn(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    float(out)
    return (time.perf_counter() - t0) / reps


def _v2_kernel(xj_ref, at_ref, w1_ref, b1_ref, out_ref, *, te, d, h, k, g):
    xj = xj_ref[:]                             # (TE, D)
    acc = jnp.dot(xj, b1_ref[:], preferred_element_type=jnp.float32)
    # xj tiled G times along lanes via a tiled-identity matmul (Mosaic has
    # no per-element lane repeat; dynamic lane slices are also forbidden,
    # hence the transposed `a` input).
    rr = jax.lax.broadcasted_iota(jnp.int32, (d, g * d), 0)
    rc = jax.lax.broadcasted_iota(jnp.int32, (d, g * d), 1)
    R = (rr == rc % d).astype(jnp.float32)                  # (D, G*D)
    xj_rep = jnp.dot(xj, R, preferred_element_type=jnp.float32)
    # lane-expansion one-hot: S[q, q*D+d] = 1, (G, G*D)
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, g * d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, g * d), 1)
    S = (rows == cols // d).astype(jnp.float32)
    n_chunks = h // g

    def body(c, acc):
        at_chunk = at_ref[pl.ds(c * g, g), :]               # (G, TE)
        a_exp = jax.lax.dot_general(
            at_chunk, S, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (TE, G*D)
        x_c = a_exp * xj_rep
        w_c = w1_ref[pl.ds(c * g * d, g * d), :]            # (G*D, K)
        return acc + jnp.dot(x_c, w_c, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    out_ref[:] = acc


def v2_fwd(xj, a, w1, b1, te=512, g=8):
    e, d = xj.shape
    h = a.shape[1]
    k = b1.shape[0] // d
    assert g % 8 == 0 and e % te == 0  # dynamic sublane slices: 8-aligned
    # pad H to a multiple of g with zero activations (zero contribution)
    hp = ((h + g - 1) // g) * g
    if hp != h:
        a = jnp.pad(a, ((0, 0), (0, hp - h)))
        w1 = jnp.pad(w1.reshape(h, d, k), ((0, hp - h), (0, 0), (0, 0)))
    else:
        w1 = w1.reshape(h, d, k)
    # w1 -> (Hp*D, K) vstack layout
    w1v = w1.reshape(hp * d, k)
    at = a.T  # (Hp, E) — sublane-sliceable per chunk
    return pl.pallas_call(
        partial(_v2_kernel, te=te, d=d, h=hp, k=k, g=g),
        grid=(e // te,),
        in_specs=[
            pl.BlockSpec((te, d), lambda i: (i, 0)),
            pl.BlockSpec((hp, te), lambda i: (0, i)),
            pl.BlockSpec((hp * d, k), lambda i: (0, 0)),
            pl.BlockSpec((d, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((te, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((e, k), jnp.float32),
    )(xj, at, w1v, b1.reshape(d, k))


def main():
    if jax.default_backend() != "tpu":
        log("TPU required")
        return
    E, D, H, K = 122_880, 100, 100, 100
    rng = np.random.default_rng(0)
    xj = jax.device_put(rng.standard_normal((E, D)).astype(np.float32))
    a = jax.device_put(rng.standard_normal((E, H)).astype(np.float32))
    w1 = jax.device_put((rng.standard_normal((H, D * K)) * 0.1).astype(np.float32))
    b1 = jax.device_put((rng.standard_normal(D * K) * 0.1).astype(np.float32))

    base = jax.jit(lambda *p: _consume(fused_bilinear_msg((512, False), *p)))
    t0 = timeit(base, xj, a, w1, b1)
    log(f"production kernel fwd: {t0*1e3:.2f} ms")

    ref = jax.jit(lambda *p: _reference_compose(*p))(xj, a, w1, b1)
    recs = {"prod_fwd_ms": t0 * 1e3}
    for g in (8, 16, 24, 56):
        try:
            got = jax.jit(lambda *p, g=g: v2_fwd(*p, g=g))(xj, a, w1, b1)
            err = float(jnp.max(jnp.abs(got - ref))
                        / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-6))
            f = jax.jit(lambda *p, g=g: _consume(v2_fwd(*p, g=g)))
            t = timeit(f, xj, a, w1, b1)
            recs[f"v2_g{g}_fwd_ms"] = t * 1e3
            recs[f"v2_g{g}_rel_err"] = err
            log(f"v2 g={g:>2}: fwd {t*1e3:.2f} ms (x{t0/t:.2f}), err {err:.1e}")
        except Exception as ex:
            log(f"v2 g={g}: FAILED {type(ex).__name__}: {str(ex)[:200]}")
            recs[f"v2_g{g}_error"] = str(ex)[:200]
    print(json.dumps(recs))


if __name__ == "__main__":
    main()
