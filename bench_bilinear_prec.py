"""Op-level A/B: fused bilinear kernel f32-MXU vs bf16-MXU vs XLA einsum.

One-off measurement harness for the r4 kernel-precision experiment
(results recorded in KERNELS.md). Run on a TPU host:

    python bench_bilinear_prec.py
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

from matdeeplearn_tpu.ops.pallas_bilinear import fused_bilinear_msg


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _consume(*xs):
    # vdot-style scalar consumption — the only reliable sync through the
    # axon tunnel is float() on a device scalar (block_until_ready returns
    # early; BULK.md), and a plain sum could be simplified away.
    s = 0.0
    for x in xs:
        f = x.ravel()[None]
        s = s + jax.lax.dot_general(f, f, (((1,), (1,)), ((), ())))[0, 0]
    return s


def timeit(fn, *a, reps=20):
    # `fn` must be jitted and return a device scalar; execution is
    # in-order, so syncing the last rep bounds the queue.
    float(fn(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    float(out)
    return (time.perf_counter() - t0) / reps


def main():
    interpret = jax.default_backend() != "tpu"
    log("backend:", jax.default_backend())
    E, D, H, K = 122_880, 100, 100, 100   # bulk-scale conv layer shapes
    rng = np.random.default_rng(0)
    xj = jax.device_put(rng.standard_normal((E, D)).astype(np.float32))
    a = jax.device_put(rng.standard_normal((E, H)).astype(np.float32))
    w1 = jax.device_put((rng.standard_normal((H, D * K)) * 0.1).astype(np.float32))
    b1 = jax.device_put((rng.standard_normal(D * K) * 0.1).astype(np.float32))
    cot = jax.device_put(rng.standard_normal((E, K)).astype(np.float32))

    recs = {}
    for name, cfg in (("f32", (512, interpret)),
                      ("bf16", (512, interpret, True)),
                      ("unitloop", (512, interpret, False, False)),
                      ("te1024", (1024, interpret))):
        try:
            fwd = jax.jit(
                lambda *p, cfg=cfg: _consume(fused_bilinear_msg(cfg, *p)))
            t_f = timeit(fwd, xj, a, w1, b1)
            fb = jax.jit(lambda *p, cfg=cfg: _consume(*jax.grad(
                lambda *q: jnp.sum(fused_bilinear_msg(cfg, *q) * p[4]),
                argnums=(0, 1, 2, 3))(*p[:4])))
            t_b = timeit(fb, xj, a, w1, b1, cot)
            recs[name] = {"fwd_ms": t_f * 1e3, "grad_ms": t_b * 1e3}
            log(f"kernel {name}: fwd {t_f*1e3:.2f} ms, grad(fwd+bwd) "
                f"{t_b*1e3:.2f} ms")
        except Exception as ex:
            log(f"kernel {name}: FAILED {type(ex).__name__}")
            recs[name] = {"error": str(ex)[:160]}

    # numerics: bf16 vs f32 kernel output
    o32 = jax.jit(lambda *p: fused_bilinear_msg((512, interpret), *p))(
        xj, a, w1, b1)
    o16 = jax.jit(lambda *p: fused_bilinear_msg((512, interpret, True), *p))(
        xj, a, w1, b1)
    err = float(jnp.max(jnp.abs(o32 - o16)) / jnp.maximum(jnp.max(jnp.abs(o32)), 1e-6))
    recs["bf16_rel_err"] = err
    log(f"bf16 rel err: {err:.2e}")

    print(json.dumps(recs))


if __name__ == "__main__":
    main()
