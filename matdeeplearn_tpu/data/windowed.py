"""Per-graph windowed edge layout for the Pallas MXU segment-sum.

The Pallas aggregation kernel (ops/pallas_segment.py) consumes edges
bucketed into aligned destination-node *windows* of `tw` rows, each
window's edges padded to a multiple of the edge-tile size `te`, pad slots
carrying dst = -1. This module builds that layout **per graph** on the
host, once, so the batch assembler (data/batching.py:assemble_batch_windowed)
can concatenate per-graph segments with pure gathers under jit: because
every graph's node span is padded to a multiple of `tw` and its edge span
to a multiple of `te`, window/tile boundaries never straddle graphs and
graph-local window ids translate to batch-global ones by an additive
offset.

Layout invariants (checked in tests/test_windowed.py):
  * every real edge of graph g appears exactly once in its windowed span,
  * wdst[slot] equals the dst of the original edge worder[slot] points at,
  * each `te`-sized tile only holds edges of a single window
    (wdst // tw constant over the tile's real slots),
  * every window of the graph owns at least one tile (self-loops guarantee
    each node window has edges; the kernel zero-initializes an output
    block only on its window's first tile).

Replaces: no reference equivalent — the reference's torch_scatter handles
ragged scatters natively on GPU (models/cgcnn.py:13, SURVEY.md §2.3); this
layout is the TPU-side answer (scatter → one-hot MXU matmuls).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class WindowedLayout:
    """Concatenated per-graph windowed edge layout (host arrays)."""

    tw: int                    # nodes per window
    te: int                    # edges per tile
    worder: np.ndarray         # (EW_tot,) int32 graph-local edge index (0 on pads)
    wvalid: np.ndarray         # (EW_tot,) float32 1 on real edge slots
    wdst: np.ndarray           # (EW_tot,) int32 graph-local dst, -1 on pads
    # Pre-permuted per-edge data in windowed order: batch assembly gathers
    # each through ONE hop (slot) instead of slot->worder->base-array —
    # measured 23->? ms off the per-step assembly at bulk scale.
    wsrc: np.ndarray           # (EW_tot,) int32 graph-local src, 0 on pads
    wweight: np.ndarray        # (EW_tot,) float32 edge weight, 0 on pads
    wdist: np.ndarray          # (EW_tot,) float32 normalized dist, 0 on pads
    wedge_ptr: np.ndarray      # (G+1,) int64 windowed-edge offsets per graph
    tile_window: np.ndarray    # (T_tot,) int32 graph-local window id per tile
    tile_first: np.ndarray     # (T_tot,) int32 1 = first tile of its window
    tile_ptr: np.ndarray       # (G+1,) int64 tile offsets per graph
    node_counts_w: np.ndarray  # (G,) int64 window-padded node counts
    in_degree: np.ndarray      # (N_tot,) float32 true in-degree per node

    @property
    def wedge_counts(self) -> np.ndarray:
        return np.diff(self.wedge_ptr)

    @property
    def tile_counts(self) -> np.ndarray:
        return np.diff(self.tile_ptr)


def build_windowed_layout(ds, tw: int, te: int) -> WindowedLayout:
    """Build the windowed layout for every graph of a GraphDataset.

    ds: GraphDataset (CSR arrays, graph-local edge indices).
    """
    num_graphs = ds.num_graphs
    node_ptr = np.asarray(ds.node_ptr, np.int64)
    edge_ptr = np.asarray(ds.edge_ptr, np.int64)
    edge_dst = np.asarray(ds.edge_dst, np.int64)
    edge_src = np.asarray(ds.edge_src, np.int64)
    edge_w = np.asarray(ds.edge_weight, np.float32)
    edge_d = np.asarray(ds.edge_dist_norm, np.float32)

    worder_parts: list[np.ndarray] = []
    wsrc_parts: list[np.ndarray] = []
    wweight_parts: list[np.ndarray] = []
    wdist_parts: list[np.ndarray] = []
    wvalid_parts: list[np.ndarray] = []
    wdst_parts: list[np.ndarray] = []
    tile_window_parts: list[np.ndarray] = []
    tile_first_parts: list[np.ndarray] = []
    wedge_counts = np.zeros(num_graphs, np.int64)
    tile_counts = np.zeros(num_graphs, np.int64)
    node_counts_w = np.zeros(num_graphs, np.int64)
    in_degree = np.zeros(node_ptr[-1], np.float32)

    for g in range(num_graphs):
        n0, n1 = node_ptr[g], node_ptr[g + 1]
        e0, e1 = edge_ptr[g], edge_ptr[g + 1]
        n = int(n1 - n0)
        dst = edge_dst[e0:e1]
        in_degree[n0:n1] = np.bincount(dst, minlength=n)

        nw = max(1, -(-n // tw))
        node_counts_w[g] = nw * tw

        order = np.argsort(dst, kind="stable").astype(np.int32)
        w_of = (dst[order] // tw).astype(np.int64)
        counts = np.bincount(w_of, minlength=nw)
        # Tile-align each window's span; empty windows still get one tile so
        # the kernel zeroes (and thus defines) their output block.
        padded = np.maximum(((counts + te - 1) // te) * te, te)
        total = int(padded.sum())

        wd = np.full(total, -1, np.int32)
        wo = np.zeros(total, np.int32)
        wv = np.zeros(total, np.float32)
        ws = np.zeros(total, np.int32)
        ww = np.zeros(total, np.float32)
        wdist_g = np.zeros(total, np.float32)
        pad_off = np.concatenate([[0], np.cumsum(padded)[:-1]])
        real_off = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = pad_off[w_of] + (np.arange(len(order)) - real_off[w_of])
        wd[pos] = dst[order]
        wo[pos] = order
        wv[pos] = 1.0
        ws[pos] = edge_src[e0:e1][order]
        ww[pos] = edge_w[e0:e1][order]
        wdist_g[pos] = edge_d[e0:e1][order]

        tiles = padded // te
        t_total = int(tiles.sum())
        t_window = np.repeat(np.arange(nw, dtype=np.int32), tiles)
        t_first = np.zeros(t_total, np.int32)
        t_first[np.concatenate([[0], np.cumsum(tiles)[:-1]])] = 1

        worder_parts.append(wo)
        wsrc_parts.append(ws)
        wweight_parts.append(ww)
        wdist_parts.append(wdist_g)
        wvalid_parts.append(wv)
        wdst_parts.append(wd)
        tile_window_parts.append(t_window)
        tile_first_parts.append(t_first)
        wedge_counts[g] = total
        tile_counts[g] = t_total

    return WindowedLayout(
        tw=tw,
        te=te,
        worder=np.concatenate(worder_parts) if worder_parts else np.zeros(0, np.int32),
        wvalid=np.concatenate(wvalid_parts) if wvalid_parts else np.zeros(0, np.float32),
        wdst=np.concatenate(wdst_parts) if wdst_parts else np.zeros(0, np.int32),
        wsrc=np.concatenate(wsrc_parts) if wsrc_parts else np.zeros(0, np.int32),
        wweight=(np.concatenate(wweight_parts)
                 if wweight_parts else np.zeros(0, np.float32)),
        wdist=(np.concatenate(wdist_parts)
               if wdist_parts else np.zeros(0, np.float32)),
        wedge_ptr=np.concatenate([[0], np.cumsum(wedge_counts)]).astype(np.int64),
        tile_window=(
            np.concatenate(tile_window_parts)
            if tile_window_parts else np.zeros(0, np.int32)
        ),
        tile_first=(
            np.concatenate(tile_first_parts)
            if tile_first_parts else np.zeros(0, np.int32)
        ),
        tile_ptr=np.concatenate([[0], np.cumsum(tile_counts)]).astype(np.int64),
        node_counts_w=node_counts_w,
        in_degree=in_degree,
    )
