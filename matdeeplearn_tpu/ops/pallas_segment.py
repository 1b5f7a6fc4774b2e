"""Pallas TPU kernels for edge aggregation: windowed MXU segment-sum.

XLA lowers jax.ops.segment_sum to a scatter, which on TPU serializes into
slow dynamic-update loops at large edge counts (measured ~5x slower than
the matmuls it feeds in a CGConv block). This module reformulates the
scatter as a sequence of small one-hot matmuls on the MXU over a
*windowed* edge layout:

  * edges are sorted by destination node and bucketed into aligned node
    windows of TW rows (window w owns dst ∈ [w·TW, (w+1)·TW)),
  * inside each window, edges are padded to a multiple of the edge-tile
    size TE; pad slots carry dst = -1 (matches no one-hot row),
  * the kernel walks edge tiles sequentially; each tile builds a
    (TE, TW) one-hot matrix from (dst - w·TW) and accumulates
    one_hotᵀ @ messages into the window's (TW, D) output block, which
    Pallas keeps resident in VMEM across the window's tiles (consecutive
    grid steps share the block index) and writes back once per window.

HBM traffic: messages read once, output written once — bandwidth-optimal;
the FLOPs ride the MXU instead of a scatter unit. The layout transform
(`windowize_edges`) is a cheap jit-side reshuffle done during batch
assembly (data/batching.py produces dst-sorted edges).

Backward (d messages = gathered cotangent) uses the same windowed layout:
a one-hot @ block matmul per tile (`windowed_gather`), wrapped in a
custom VJP so the pair is autodiff-complete.

Reference role replaced: torch_scatter scatter_add/mean (models/cgcnn.py:13
et al.) — see SURVEY.md §2.3.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_TE = 512   # edges per tile
DEFAULT_TW = 512   # nodes per window


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class WindowedEdges(NamedTuple):
    """Edge arrays re-bucketed into aligned dst windows (static shapes)."""

    order: jax.Array      # (EW,) int32 gather map into the original edge
                          #   arrays (clipped to 0 for pad slots)
    dst: jax.Array        # (EW,) int32 destination, -1 on pad slots
    window_id: jax.Array  # (T,) int32 window index per edge tile
    first_tile: jax.Array # (T,) int32 1 where a tile starts its window
    valid: jax.Array      # (EW,) float32 1 on real edge slots

    @property
    def num_tiles(self) -> int:
        return self.window_id.shape[0]


def windowed_sizes(num_nodes: int, num_edges: int, tw: int = DEFAULT_TW,
                   te: int = DEFAULT_TE):
    """Static (num_windows, padded edge capacity) for a batch spec."""
    nw = max(1, round_up(num_nodes, tw) // tw)
    ew = round_up(num_edges, te) + nw * te  # per-window padding worst case
    return nw, ew


def windowize_edges(
    edge_dst: jax.Array,
    edge_mask: jax.Array,
    num_nodes: int,
    tw: int = DEFAULT_TW,
    te: int = DEFAULT_TE,
) -> WindowedEdges:
    """Jit-side layout transform. Requires edges sorted by dst with pad
    slots at the tail (the batch assembler's windowed mode guarantees it).
    """
    e = edge_dst.shape[0]
    nw, ew = windowed_sizes(num_nodes, e, tw, te)
    valid_in = edge_mask > 0
    w_of_edge = jnp.where(valid_in, edge_dst // tw, nw - 1).astype(jnp.int32)

    # real edges per window and padded (tile-aligned, >=1 tile) extents
    counts = jax.ops.segment_sum(
        valid_in.astype(jnp.int32), w_of_edge, num_segments=nw
    )
    padded = jnp.maximum(((counts + te - 1) // te) * te, te)
    pad_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    real_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(counts)[:-1].astype(jnp.int32)])

    # position of each real edge in the windowed buffer
    eidx = jnp.arange(e, dtype=jnp.int32)
    pos = pad_off[w_of_edge] + (eidx - real_off[w_of_edge])
    pos = jnp.where(valid_in, pos, ew)  # dump pads out of range

    order = jnp.zeros(ew + 1, jnp.int32).at[pos].set(eidx, mode="drop")
    taken = jnp.zeros(ew + 1, jnp.bool_).at[pos].set(True, mode="drop")
    order, taken = order[:ew], taken[:ew]

    dst = jnp.where(taken, edge_dst[order], -1).astype(jnp.int32)

    t = ew // te
    tile_start = jnp.arange(t, dtype=jnp.int32) * te
    window_id = jnp.searchsorted(
        jnp.cumsum(padded).astype(jnp.int32), tile_start, side="right"
    ).astype(jnp.int32)
    # Tiles beyond the packed extent are pure overflow capacity (all pad
    # slots); clamp them onto the last window where they accumulate zeros.
    window_id = jnp.minimum(window_id, nw - 1)
    first_tile = (tile_start == pad_off[window_id]).astype(jnp.int32)
    return WindowedEdges(
        order=order,
        dst=dst,
        window_id=window_id,
        first_tile=first_tile,
        valid=taken.astype(jnp.float32),
    )


# ------------------------------------------------------------------ kernels


def _hilo(v):
    """Split f32 into two bf16-exact f32 parts (hi + lo == v to ~2^-17).

    The TPU MXU multiplies in bf16; a single-pass one-hot matmul would
    truncate the f32 messages to ~2e-3 relative error (measured on v5e,
    KERNELS.json r2). The one-hot operand is exactly representable, so a
    two-pass hi/lo split of the data operand restores f32-class accuracy
    at 2x the (cheap, bandwidth-dominated) MXU work."""
    hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, v - hi


def _seg_sum_kernel(wid_ref, first_ref, dst_ref, msg_ref, out_ref, *, tw, te,
                    hilo=True):
    t = pl.program_id(0)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = wid_ref[t] * tw
    local = dst_ref[:] - base                       # (TE, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (te, tw), 1)
    onehot = (local == rows).astype(jnp.float32)    # (TE, TW)
    dn = (((0,), (0,)), ((), ()))
    if hilo:
        hi, lo = _hilo(msg_ref[:])
        out_ref[:] += jax.lax.dot_general(
            onehot, hi, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            onehot, lo, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
    else:
        # single-pass: messages truncate to bf16 on the MXU (~2e-3 relative)
        out_ref[:] += jax.lax.dot_general(
            onehot, msg_ref[:], dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )


def _seg_sum_weighted_kernel(wid_ref, first_ref, dst_ref, w_ref, msg_ref,
                             out_ref, *, tw, te, hilo=True):
    """Weighted segment-sum: out[n] = Σ_e w[e]·msg[e] — a true SpMM
    (A_norm @ X with A's nonzeros = w) for GCN's normalized aggregation.
    The weight multiply happens on the VPU inside the kernel, so the
    scaled messages never round-trip through HBM (XLA cannot fuse
    elementwise producers into a pallas_call)."""
    t = pl.program_id(0)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = wid_ref[t] * tw
    local = dst_ref[:] - base
    rows = jax.lax.broadcasted_iota(jnp.int32, (te, tw), 1)
    onehot = (local == rows).astype(jnp.float32)
    dn = (((0,), (0,)), ((), ()))
    scaled = msg_ref[:] * w_ref[:]
    if hilo:
        hi, lo = _hilo(scaled)
        out_ref[:] += jax.lax.dot_general(
            onehot, hi, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            onehot, lo, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
    else:
        out_ref[:] += jax.lax.dot_general(
            onehot, scaled, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )


def _gather_kernel(wid_ref, first_ref, dst_ref, x_ref, out_ref, *, tw, te,
                   hilo=True):
    base = wid_ref[pl.program_id(0)] * tw
    local = dst_ref[:] - base
    rows = jax.lax.broadcasted_iota(jnp.int32, (te, tw), 1)
    onehot = (local == rows).astype(jnp.float32)
    if hilo:
        hi, lo = _hilo(x_ref[:])
        out_ref[:] = (
            jnp.dot(onehot, hi, preferred_element_type=jnp.float32)
            + jnp.dot(onehot, lo, preferred_element_type=jnp.float32)
        )
    else:
        out_ref[:] = jnp.dot(onehot, x_ref[:],
                             preferred_element_type=jnp.float32)


def _out_struct(shape, *operands):
    """Out ShapeDtypeStruct with varying-manual-axes metadata propagated
    from the operands — required when the kernel runs inside a dp-manual
    jax.shard_map region (check_vma=True)."""
    try:
        vma = frozenset().union(
            *(jax.typeof(o).vma for o in operands)
        )
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=vma)
    except (AttributeError, TypeError):
        return jax.ShapeDtypeStruct(shape, jnp.float32)


def _windowed_segment_sum_impl(messages, we: WindowedEdges, num_nodes, tw, te,
                               interpret, hilo=True):
    ew, d = messages.shape
    t = ew // te
    n_pad = round_up(num_nodes, tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((te, 1), lambda i, wid, first: (i, 0)),
            pl.BlockSpec((te, d), lambda i, wid, first: (i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tw, d), lambda i, wid, first: (wid[i], 0)
        ),
    )
    out = pl.pallas_call(
        partial(_seg_sum_kernel, tw=tw, te=te, hilo=hilo),
        out_shape=_out_struct((n_pad, d), messages, we.dst, we.window_id),
        grid_spec=grid_spec,
        interpret=interpret,
    )(we.window_id, we.first_tile, we.dst[:, None], messages)
    return out[:num_nodes]


def _windowed_spmm_impl(weights, messages, we: WindowedEdges, num_nodes, tw,
                        te, interpret, hilo=True):
    ew, d = messages.shape
    t = ew // te
    n_pad = round_up(num_nodes, tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((te, 1), lambda i, wid, first: (i, 0)),
            pl.BlockSpec((te, 1), lambda i, wid, first: (i, 0)),
            pl.BlockSpec((te, d), lambda i, wid, first: (i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tw, d), lambda i, wid, first: (wid[i], 0)
        ),
    )
    out = pl.pallas_call(
        partial(_seg_sum_weighted_kernel, tw=tw, te=te, hilo=hilo),
        out_shape=_out_struct((n_pad, d), messages, weights, we.dst,
                              we.window_id),
        grid_spec=grid_spec,
        interpret=interpret,
    )(we.window_id, we.first_tile, we.dst[:, None], weights[:, None], messages)
    return out[:num_nodes]


def _windowed_gather_impl(x, we: WindowedEdges, tw, te, interpret, hilo=True):
    n, d = x.shape
    ew = we.dst.shape[0]
    t = ew // te
    n_pad = round_up(n, tw)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((te, 1), lambda i, wid, first: (i, 0)),
            pl.BlockSpec((tw, d), lambda i, wid, first: (wid[i], 0)),
        ],
        out_specs=pl.BlockSpec((te, d), lambda i, wid, first: (i, 0)),
    )
    return pl.pallas_call(
        partial(_gather_kernel, tw=tw, te=te, hilo=hilo),
        out_shape=_out_struct((ew, d), x, we.dst, we.window_id),
        grid_spec=grid_spec,
        interpret=interpret,
    )(we.window_id, we.first_tile, we.dst[:, None], x)


# ------------------------------------------------------- public, with VJP


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def windowed_segment_sum(messages, we: WindowedEdges, num_nodes: int,
                         tw: int = DEFAULT_TW, te: int = DEFAULT_TE,
                         interpret: bool = False, hilo: bool = True):
    """out[n] = Σ_{e: dst[e]==n} messages[e] over the windowed layout.

    messages: (EW, D) float32 in windowed order (pad slots may hold
    arbitrary values — dst=-1 excludes them). Returns (num_nodes, D).
    """
    return _windowed_segment_sum_impl(messages, we, num_nodes, tw, te,
                                      interpret, hilo)


def _wss_fwd(messages, we, num_nodes, tw, te, interpret, hilo):
    return _windowed_segment_sum_impl(messages, we, num_nodes, tw, te,
                                      interpret, hilo), we


def _wss_bwd(num_nodes, tw, te, interpret, hilo, we, g):
    # d messages[e] = g[dst[e]] — the windowed gather, on the MXU too.
    return (_windowed_gather_impl(g, we, tw, te, interpret, hilo), None)


windowed_segment_sum.defvjp(_wss_fwd, _wss_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def windowed_spmm(weights, messages, we: WindowedEdges, num_nodes: int,
                  tw: int = DEFAULT_TW, te: int = DEFAULT_TE,
                  interpret: bool = False, hilo: bool = True):
    """out[n] = Σ_{e: dst[e]==n} weights[e]·messages[e] — sparse-matrix ×
    dense-matrix product with the edge weights as A's nonzeros, fused into
    one MXU pass (the torch_sparse SpMM role, reference README.md:33; used
    by GCN's deg^-1/2 normalized aggregation, models/gcn.py:120-173).

    weights: (EW,) f32 in windowed order (pad slots arbitrary — dst=-1
    excludes them). messages: (EW, D). Returns (num_nodes, D).
    """
    return _windowed_spmm_impl(weights, messages, we, num_nodes, tw, te,
                               interpret, hilo)


def _wspmm_fwd(weights, messages, we, num_nodes, tw, te, interpret, hilo):
    out = _windowed_spmm_impl(weights, messages, we, num_nodes, tw, te,
                              interpret, hilo)
    return out, (weights, messages, we)


def _wspmm_bwd(num_nodes, tw, te, interpret, hilo, res, g):
    weights, messages, we = res
    # gg[e] = g[dst[e]] (windowed MXU gather), then
    # d messages = w·gg, d weights = <messages, gg> rowwise.
    gg = _windowed_gather_impl(g, we, tw, te, interpret, hilo)
    d_msg = gg * weights[:, None]
    d_w = jnp.sum(messages * gg, axis=-1)
    return (d_w, d_msg, None)


windowed_spmm.defvjp(_wspmm_fwd, _wspmm_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def windowed_gather(x, we: WindowedEdges, tw: int = DEFAULT_TW,
                    te: int = DEFAULT_TE, interpret: bool = False,
                    hilo: bool = True):
    """out[e] = x[dst[e]] (zeros on pad slots) over the windowed layout."""
    return _windowed_gather_impl(x, we, tw, te, interpret, hilo)


def _wg_fwd(x, we, tw, te, interpret, hilo):
    return _windowed_gather_impl(x, we, tw, te, interpret, hilo), (we, x.shape[0])


def _wg_bwd(tw, te, interpret, hilo, res, g):
    we, n = res
    return (_windowed_segment_sum_impl(g, we, n, tw, te, interpret, hilo),
            None)


windowed_gather.defvjp(_wg_fwd, _wg_bwd)
