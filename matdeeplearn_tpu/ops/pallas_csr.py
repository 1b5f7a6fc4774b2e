"""Dst-sorted CSR segment-reduce Pallas kernel.

The r4 roofline work (BULK.md) left the packed XLA path latency-bound:
`jax.ops.segment_sum`'s TPU scatter lowering moves 44 MB in 1.64 ms
(~27 GB/s effective) at packed-bin scale because it issues per-row
random HBM accesses, and neither dst-sorting the data nor the
`indices_are_sorted` promise changes that lowering
(bench_sorted_scatter.py). This kernel is the design XLA won't emit:
with edges sorted by destination, a sequential pass over edge tiles
touches only a small contiguous node window per tile —

    for each edge tile t (sequential grid), sub-chunk s:
        base = align8(dst[first edge of chunk])    (XLA precomputed)
        out[base : base+W] += onehotᵀ(dst-base) @ msg_chunk      (MXU)

so edge reads stream at HBM bandwidth, node writes are W-row
VMEM-resident read-modify-writes (the (N, D) output lives in VMEM for
the whole pass and is written back once), and no random HBM access
exists anywhere. The r5 ablation found small grids pay ~6 µs/step of
fixed grid overhead (216 steps ≈ 1.3 ms — the whole kernel budget), so
each grid step processes NSUB sub-chunks via Python-unrolled static
slices: grid steps drop 8×, windows stay small (W = TE+128, keeping the
one-hot matmul cheap).

The scatter becomes an MXU one-hot matmul exactly like the r2 windowed
kernel (ops/pallas_segment.py) — but WITHOUT that kernel's two e2e
killers: there is no windowed edge layout (the kernel tiles the same
flat (E, D) message tensor the XLA path uses, so the conv MLPs pay zero
extra pad slots) and the window is not capped by the structure size
(graphs carry a self-loop per node — data/graphs.py:add_self_loops,
reference process.py:301-302 — so TE consecutive dst-sorted edges span
at most TE distinct, hole-free node ids).

Sortedness is a LAYOUT CONTRACT, not an assumption: the wrapper
verifies per-chunk window membership of every real edge on device and
`lax.cond`s to the plain XLA segment-sum when violated (unsorted input,
self-loop-free graphs), so the op is correct for any input and fast for
the dst-sorted layout data/batching.py produces under `kernel: csr`.

The backward of segment-sum is the gather d_msg[e] = g[dst[e]] — the
same latency-bound op on XLA — and rides the same windows: the
cotangent lives VMEM-resident, each chunk reads its W-row window once
and distributes rows to edges with the one-hot matmul. `sorted_gather`
exposes the same pair in the opposite direction for dst-side feature
gathers (CGConv's x_i), with the CSR scatter as ITS backward.

Precision follows ops/pallas_segment.py: the MXU multiplies in bf16, so
`hilo=True` (default) splits the f32 data operand into two bf16-exact
passes (~2^-17 accuracy); hilo=False is the single-pass arm for
`precision: bf16` runs. Interpret mode (CPU) runs a single
HIGHEST-precision pass instead — exact, and immune to XLA's dot-merger
rewriting dot(A,hi)+dot(A,lo) into one DEFAULT-precision dot (which on
avx512bf16 XLA:CPU rounds operands to bf16 and silently undoes hilo;
measured r5).

Reference role replaced: torch_scatter scatter_add/scatter_mean and the
torch_sparse SpMM aggregation (SURVEY §2.3; reference README.md:33).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Edge-chunk size. In-context sweep at packed-bin shapes (CGCNN bf16
# fwd+bwd, one v5e, r5): te=128 → 15.9 ms, 256 → 16.1-16.5, 512 → 17.3,
# 1024 → 20.1 — the W=te+128 window sets the one-hot matmul FLOPs, so
# smaller chunks win until grid overhead bites. MDL_CSR_TE overrides.
try:
    DEFAULT_TE = int(_os.environ.get("MDL_CSR_TE", "128"))
except ValueError as _e:
    raise ValueError(
        f"MDL_CSR_TE={_os.environ['MDL_CSR_TE']!r} is not an integer"
    ) from _e
if DEFAULT_TE <= 0:
    raise ValueError(f"MDL_CSR_TE must be positive, got {DEFAULT_TE}")
EXTRA_W = 128  # window headroom over TE: 8-align of base + lane multiple
NSUB = 8       # sub-chunks per grid step (amortizes ~6 µs/step overhead)
# resident (N, D) block budget: beyond this the wrapper statically falls
# back to XLA (padded-batch node counts can exceed VMEM)
RES_BYTES_MAX = 10 * 2 ** 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hilo(v):
    """f32 → two bf16-exact parts (see ops/pallas_segment.py:_hilo)."""
    hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, v - hi


def _out_struct(shape, *operands):
    """ShapeDtypeStruct with varying-manual-axes propagated (needed when
    the kernel runs inside a dp-manual shard_map region)."""
    try:
        vma = frozenset().union(*(jax.typeof(o).vma for o in operands))
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=vma)
    except (AttributeError, TypeError):
        return jax.ShapeDtypeStruct(shape, jnp.float32)


def _resident_too_big(n, te, d):
    w = te + EXTRA_W
    n_res = _round_up(max(n, w) + 8, 8)
    return n_res * _round_up(d, 128) * 4 > RES_BYTES_MAX


# ------------------------------------------------------------------ kernels


def _dots(a, b, hilo, interpret, dn):
    prec = jax.lax.Precision.HIGHEST if interpret else None
    if hilo and not interpret:
        hi, lo = _hilo(b)
        return jax.lax.dot_general(
            a, hi, dimension_numbers=dn, precision=prec,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            a, lo, dimension_numbers=dn, precision=prec,
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn, precision=prec,
        preferred_element_type=jnp.float32)


def _csr_sum_kernel(bases_ref, dstT_ref, msg_ref, out_ref, *, te, w, hilo,
                    interpret, nsub):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (w, te), 0)
    dn = (((1,), (0,)), ((), ()))
    for s in range(nsub):  # static unroll — all slices compile-time
        # bases ship pre-divided by 8: the *8 makes the dynamic sublane
        # slice start PROVABLY 8-aligned for Mosaic (plain prefetched
        # values fail "cannot statically prove index is a multiple of 8"
        # once the lane dim spans >1 tile, e.g. D=150 SchNet filters).
        base = bases_ref[t * nsub + s] * 8
        localT = dstT_ref[:, s * te:(s + 1) * te] - base     # (1, TE)
        onehot_t = (localT == rows).astype(jnp.float32)      # (W, TE);
        # out-of-window edges (pads, foreign chunks) match no row
        contrib = _dots(onehot_t, msg_ref[s * te:(s + 1) * te, :],
                        hilo, interpret, dn)                 # (W, D)
        out_ref[pl.ds(base, w), :] += contrib  # 8-aligned dyn slice start


def _csr_gather_kernel(bases_ref, dst_ref, g_ref, out_ref, *, te, w, hilo,
                       interpret, nsub):
    t = pl.program_id(0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (te, w), 1)
    dn = (((1,), (0,)), ((), ()))
    for s in range(nsub):
        base = bases_ref[t * nsub + s] * 8   # see sum kernel: provable align
        local = dst_ref[s * te:(s + 1) * te, :] - base       # (TE, 1)
        onehot = (local == cols).astype(jnp.float32)         # (TE, W)
        window = g_ref[pl.ds(base, w), :]                    # (W, D) resident
        out_ref[s * te:(s + 1) * te, :] = _dots(
            onehot, window, hilo, interpret, dn)


# ------------------------------------------------------------------- impls


def _prep(dst, mask, e, n, te, nsub=NSUB):
    """Sentinel-map pads, tile-pad, compute per-chunk aligned window bases
    and the on-device sortedness/window-membership certificate."""
    w = te + EXTRA_W
    n_res = _round_up(max(n, w) + 8, 8)
    ep = _round_up(e, te * nsub)
    dst_p = dst if mask is None else jnp.where(mask > 0, dst, n)
    if ep != e:
        dst_p = jnp.pad(dst_p, (0, ep - e), constant_values=n)
    t = ep // te
    starts = dst_p[:: te]                                       # (T,)
    bases = jnp.clip(starts & ~7, 0, n_res - w).astype(jnp.int32)
    off = dst_p.reshape(t, te) - bases[:, None]
    real = dst_p.reshape(t, te) < n
    ok = jnp.all(jnp.where(real, (off >= 0) & (off < w), True))
    return dst_p, bases, ok, ep, t, w, n_res


def _csr_sum_impl(messages, dst_p, bases, ep, t, w, n_res, te, interpret,
                  hilo, nsub=NSUB):
    e, d = messages.shape
    if ep != e:
        messages = jnp.pad(messages, ((0, ep - e), (0, 0)))
    tg = te * nsub
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // nsub,),
        in_specs=[
            pl.BlockSpec((1, tg), lambda i, b: (0, i)),
            pl.BlockSpec((tg, d), lambda i, b: (i, 0)),
        ],
        out_specs=pl.BlockSpec((n_res, d), lambda i, b: (0, 0)),
    )
    return pl.pallas_call(
        partial(_csr_sum_kernel, te=te, w=w, hilo=hilo, interpret=interpret,
                nsub=nsub),
        out_shape=_out_struct((n_res, d), messages, dst_p, bases),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bases // 8, dst_p[None, :], messages)


def _csr_gather_impl(g, dst_p, bases, ep, t, w, n_res, te, interpret, hilo,
                     nsub=NSUB):
    n, d = g.shape
    if n_res != n:
        g = jnp.pad(g, ((0, n_res - n), (0, 0)))
    tg = te * nsub
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // nsub,),
        in_specs=[
            pl.BlockSpec((tg, 1), lambda i, b: (i, 0)),
            pl.BlockSpec((n_res, d), lambda i, b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tg, d), lambda i, b: (i, 0)),
    )
    return pl.pallas_call(
        partial(_csr_gather_kernel, te=te, w=w, hilo=hilo,
                interpret=interpret, nsub=nsub),
        out_shape=_out_struct((ep, d), g, dst_p, bases),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bases // 8, dst_p[:, None], g)


# ------------------------------------------------------- public, with VJP


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def sorted_segment_sum(messages, dst, mask, num_segments: int,
                       te: int = DEFAULT_TE, interpret: bool = False,
                       hilo: bool = True):
    """out[n] = Σ_{e: dst[e]==n} messages[e]·mask[e] — the dst-sorted CSR
    segment-sum. Fast path requires dst non-decreasing over real
    (mask>0) edges with ≤TE-node spans per TE-edge chunk (guaranteed by
    per-graph dst-sorted edge order + per-node self-loops); any other
    input takes a verified lax.cond fallback to XLA's segment_sum, so
    correctness never depends on the layout. mask may be None.
    """
    return _ss_fwd(messages, dst, mask, num_segments, te, interpret, hilo)[0]


def _xla_sum(messages, dst_clip, mask, n):
    if mask is not None:
        messages = messages * mask[:, None].astype(messages.dtype)
    return jax.ops.segment_sum(messages, dst_clip, num_segments=n)


def _ss_fwd(messages, dst, mask, n, te, interpret, hilo):
    e, d = messages.shape
    in_manual = bool(getattr(jax.typeof(messages), "vma", frozenset()))
    if (interpret and in_manual) or _resident_too_big(n, te, d):
        # interpret-mode pallas_call inside a manual shard_map region trips
        # a jax-0.9 lowering-cache bug (see ops/aggregate.py); oversized
        # node counts exceed the resident-output VMEM budget. Identical
        # math on the XLA path; bases=None in the residuals marks it.
        out = _xla_sum(messages, jnp.minimum(dst, n - 1), mask, n)
        return out, (dst, None, None, mask, e)
    dst_p, bases, ok, ep, t, w, n_res = _prep(dst, mask, e, n, te)
    msg_m = messages if mask is None else (
        messages * mask[:, None].astype(messages.dtype)
    )

    def fast(m):
        return _csr_sum_impl(
            m.astype(jnp.float32), dst_p, bases, ep, t, w, n_res, te,
            interpret, hilo,
        )[:n].astype(m.dtype)

    def slow(m):
        return _xla_sum(m, jnp.minimum(dst_p[:e], n - 1), None, n)

    out = jax.lax.cond(ok, fast, slow, msg_m)
    return out, (dst_p, bases, ok, mask, e)


def _ss_bwd(n, te, interpret, hilo, res, g):
    dst_p, bases, ok, mask, e = res
    if bases is None:  # interpret+manual / oversized fallback
        gg = jnp.take(g, jnp.minimum(dst_p, n - 1), axis=0)
        if mask is not None:
            gg = gg * mask[:, None].astype(gg.dtype)
        return (gg, None, None)
    ep = _round_up(e, te * NSUB)
    t, w = ep // te, te + EXTRA_W
    n_res = _round_up(max(n, w) + 8, 8)

    def fast(gv):
        return _csr_gather_impl(
            gv.astype(jnp.float32), dst_p, bases, ep, t, w, n_res, te,
            interpret, hilo,
        )[:e].astype(gv.dtype)

    def slow(gv):
        return jnp.take(gv, jnp.minimum(dst_p[:e], n - 1), axis=0)

    gg = jax.lax.cond(ok, fast, slow, g)
    if mask is not None:
        gg = gg * mask[:, None].astype(gg.dtype)
    return (gg, None, None)


sorted_segment_sum.defvjp(_ss_fwd, _ss_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def sorted_gather(x, dst, mask, num_segments: int, te: int = DEFAULT_TE,
                  interpret: bool = False, hilo: bool = True):
    """out[e] = x[dst[e]]·mask[e] — the dst-side feature gather (CGConv's
    x_i, MEGNet's dst features) over the same CSR windows: x stays
    VMEM-resident, each chunk reads its W-row window once, rows reach
    edges through the one-hot MXU matmul. VJP is the CSR segment-sum
    (d_x = scatter-add of the cotangent at dst). Same layout contract +
    verified XLA fallback as sorted_segment_sum. mask may be None.
    """
    return _sg_fwd(x, dst, mask, num_segments, te, interpret, hilo)[0]


def _sg_fwd(x, dst, mask, n, te, interpret, hilo):
    e = dst.shape[0]
    in_manual = bool(getattr(jax.typeof(x), "vma", frozenset()))
    if (interpret and in_manual) or _resident_too_big(n, te, x.shape[-1]):
        out = jnp.take(x, jnp.minimum(dst, n - 1), axis=0)
        if mask is not None:
            out = out * mask[:, None].astype(out.dtype)
        return out, (dst, None, None, mask, e)
    dst_p, bases, ok, ep, t, w, n_res = _prep(dst, mask, e, n, te)

    def fast(xv):
        return _csr_gather_impl(
            xv.astype(jnp.float32), dst_p, bases, ep, t, w, n_res, te,
            interpret, hilo,
        )[:e].astype(xv.dtype)

    def slow(xv):
        return jnp.take(xv, jnp.minimum(dst_p[:e], n - 1), axis=0)

    out = jax.lax.cond(ok, fast, slow, x)
    if mask is not None:
        out = out * mask[:, None].astype(out.dtype)
    return out, (dst_p, bases, ok, mask, e)


def _sg_bwd(n, te, interpret, hilo, res, g):
    dst_p, bases, ok, mask, e = res
    if bases is None:  # interpret+manual / oversized fallback
        if mask is not None:
            g = g * mask[:, None].astype(g.dtype)
        return (jax.ops.segment_sum(g, jnp.minimum(dst_p, n - 1),
                                    num_segments=n), None, None)
    if mask is not None:
        g = g * mask[:, None].astype(g.dtype)
    ep = _round_up(e, te * NSUB)
    t, w = ep // te, te + EXTRA_W
    n_res = _round_up(max(n, w) + 8, 8)

    def fast(gv):
        return _csr_sum_impl(
            gv.astype(jnp.float32), dst_p, bases, ep, t, w, n_res, te,
            interpret, hilo,
        )[:n].astype(gv.dtype)

    def slow(gv):
        return jax.ops.segment_sum(gv, jnp.minimum(dst_p[:e], n - 1),
                                   num_segments=n)

    return (jax.lax.cond(ok, fast, slow, g), None, None)


sorted_gather.defvjp(_sg_fwd, _sg_bwd)
