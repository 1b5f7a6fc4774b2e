"""Static-shape graph batching, assembled on device under jit.

The reference streams PyG `Data` objects through a Python DataLoader
(training/training.py:38-41, process.py:133-189) — dynamic shapes, host-side
collation, one host→device transfer per tensor per step. On TPU that model
is hostile to XLA (recompiles per shape) and to HBM bandwidth.

TPU-native design here:
  * the full featurized dataset lives in HBM once (`DeviceDataset`),
  * every batch has a fixed static shape (`BatchSpec`) chosen once per
    dataset+batch_size so jit compiles exactly one step program,
  * per step the host ships only a (B,) int32 vector of graph ids;
    `assemble_batch` gathers nodes/edges and builds masks entirely on
    device with vectorized searchsorted/cumsum — no scalar loops,
  * ragged graphs are handled by padding + masks: pad nodes belong to a
    dummy segment (id = num_graphs), pad edges are masked out of every
    aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class BatchSpec:
    """Static batch geometry: one compiled program per spec."""

    num_graphs: int  # B graph slots (trailing slots may be padding)
    num_nodes: int   # padded node slots
    num_edges: int   # padded edge slots

    @classmethod
    def for_dataset(cls, node_counts, edge_counts, batch_size: int, align: int = 8,
                    align_edges: int | None = None):
        """Tight upper bound over any batch of `batch_size` graphs: the sum of
        the `batch_size` largest node/edge counts, aligned for TPU tiling.
        Guarantees zero recompilation and zero overflow for any shuffle."""
        b = min(batch_size, len(node_counts))
        n = int(np.sort(np.asarray(node_counts))[-b:].sum())
        e = int(np.sort(np.asarray(edge_counts))[-b:].sum())
        return cls(
            batch_size,
            round_up(max(n, 1), align),
            round_up(max(e, 1), align_edges or align),
        )

    @classmethod
    def packed_for_dataset(cls, node_counts, edge_counts, batch_size: int,
                           align: int = 8, align_edges: int | None = None,
                           slack: float = 1.08):
        """Budget-packed spec for size-skewed datasets (`batching: packed`).

        `for_dataset` pads every batch to the sum of the `batch_size`
        LARGEST graphs — on bulk-scale data (mean ~30 atoms, max ~200+)
        most of that capacity is pad waste. Here the node/edge capacity is
        ~mean·B + max (enough for balanced greedy bin packing, see
        packed_id_matrix); graph slots get 1.5× headroom so many-small-graph
        bins still fit. Per-batch composition varies (similar total
        nodes/edges, variable graph count); the sample-weighted loss
        (training/train.py:_masked_mean × count accumulation) keeps the
        epoch objective identical to the reference's.
        """
        nc = np.asarray(node_counts)
        ec = np.asarray(edge_counts)
        b = min(batch_size, len(nc))
        n = int(np.ceil(slack * float(nc.mean()) * b + nc.max()))
        e = int(np.ceil(slack * float(ec.mean()) * b + ec.max()))
        return cls(
            int(np.ceil(1.5 * batch_size)) + 1,
            round_up(max(n, 1), align),
            round_up(max(e, 1), align_edges or align),
        )


class DeviceDataset(struct.PyTreeNode):
    """Featurized dataset resident in device memory (HBM)."""

    node_x: jax.Array        # (N, F) float32
    node_ptr: jax.Array      # (G+1,) int32
    edge_ptr: jax.Array      # (G+1,) int32
    node_counts: jax.Array   # (G,) int32
    edge_counts: jax.Array   # (G,) int32
    y: jax.Array             # (G, T) float32 — after target-index selection
    u: jax.Array             # (G, 3) float32
    # Per-field edge arrays: None when edge_packed carries them (the default
    # — keeping both doubled device edge storage, hundreds of MB at 46k
    # scale; ADVICE r3 #1). Populated only by callers that opt out of
    # packing.
    edge_src: jax.Array | None = None      # (E,) int32 graph-local
    edge_dst: jax.Array | None = None      # (E,) int32 graph-local
    edge_weight: jax.Array | None = None   # (E,) float32 raw distance
    edge_dist_norm: jax.Array | None = None  # (E,) float32
    extra: jax.Array | None = None  # (G, D) whole-structure descriptors (SOAP/SM)
    windowed: "WindowedDeviceData | None" = None  # Pallas windowed layout
    # (E, 4) int32 [src, dst, bitcast(weight), bitcast(dist_norm)]: batch
    # assembly gathers ONE 16-byte row per edge instead of four 4-byte rows
    # — random-row gathers are latency-bound on TPU, and assembly measured
    # 38% of the packed bulk epoch before this packing (BULK.md ablation).
    edge_packed: jax.Array | None = None
    # Per-graph sorted edge order (kernel: csr): "dst" sorts each graph's
    # edges by (local dst, local src), "src" by (local src, local dst).
    # Graphs occupy contiguous node ranges in slot order, so either makes
    # the corresponding assembled-batch index globally non-decreasing —
    # the layout contract of ops/pallas_csr.py. None = reference order.
    edge_order: str | None = struct.field(pytree_node=False, default=None)
    # (N_tot,) f32 per-node degree AT THE SORTED SIDE (in-degree under
    # "dst", out-degree under "src") — a dataset constant, assembled into
    # batches by the node gather (a per-assembly count scatter measured
    # ~1 ms at bin scale; this is free).
    node_indeg: jax.Array | None = None

    @property
    def dst_sorted(self) -> bool:
        return self.edge_order == "dst"

    @property
    def src_sorted(self) -> bool:
        return self.edge_order == "src"

    @classmethod
    def from_graph_dataset(cls, ds, extra_key: str | None = None,
                           edge_order: str | None = None) -> "DeviceDataset":
        y = ds.targets
        if y.ndim == 1:
            y = y[:, None]
        if extra_key is None and len(ds.extra_features) == 1:
            extra_key = next(iter(ds.extra_features))
        extra = (
            jnp.asarray(ds.extra_features[extra_key], jnp.float32)
            if extra_key and extra_key in ds.extra_features
            else None
        )
        esrc = np.asarray(ds.edge_src, np.int32)
        edst = np.asarray(ds.edge_dst, np.int32)
        ew = np.asarray(ds.edge_weight, np.float32)
        ed = np.asarray(ds.edge_dist_norm, np.float32)
        node_indeg = None
        assert edge_order in (None, "dst", "src"), edge_order
        if edge_order is not None:
            # One host-side lexsort per run (~1 s at 20M edges): within
            # each graph order edges by the sorted-side local id. Node ids
            # are graph-local here, so the key needs the graph id major.
            gid = np.repeat(
                np.arange(len(ds.node_ptr) - 1, dtype=np.int64),
                np.diff(ds.edge_ptr),
            )
            major, minor = ((edst, esrc) if edge_order == "dst"
                            else (esrc, edst))
            perm = np.lexsort((minor, major, gid))
            esrc, edst, ew, ed = esrc[perm], edst[perm], ew[perm], ed[perm]
            # dataset-global per-node sorted-side degree (global id =
            # local id + the graph's node offset)
            side = edst if edge_order == "dst" else esrc
            nptr = np.asarray(ds.node_ptr, np.int64)
            indeg = np.zeros(int(nptr[-1]), np.float32)
            np.add.at(indeg, side.astype(np.int64) + nptr[gid[perm]], 1.0)
            node_indeg = jnp.asarray(indeg)
        packed = np.empty((len(esrc), 4), np.int32)
        packed[:, 0] = esrc
        packed[:, 1] = edst
        packed[:, 2] = ew.view(np.int32)
        packed[:, 3] = ed.view(np.int32)
        return cls(
            extra=extra,
            edge_order=edge_order,
            node_indeg=node_indeg,
            edge_packed=jnp.asarray(packed),
            node_x=jnp.asarray(ds.node_x, jnp.float32),
            node_ptr=jnp.asarray(ds.node_ptr, jnp.int32),
            edge_ptr=jnp.asarray(ds.edge_ptr, jnp.int32),
            node_counts=jnp.asarray(np.diff(ds.node_ptr), jnp.int32),
            edge_counts=jnp.asarray(np.diff(ds.edge_ptr), jnp.int32),
            y=jnp.asarray(y, jnp.float32),
            u=jnp.asarray(ds.u, jnp.float32),
        )


class GraphBatch(struct.PyTreeNode):
    """A static-shape padded batch of graphs.

    Pad conventions:
      * pad nodes: node_graph == num_graphs (dummy segment), node_mask 0
      * pad edges: src/dst clipped to slot 0, edge_mask 0 — every
        aggregation in ops/ takes the mask
      * pad graph slots: graph_mask 0, y arbitrary
    """

    x: jax.Array            # (N_pad, F)
    edge_src: jax.Array     # (E_pad,) batch-global node index
    edge_dst: jax.Array     # (E_pad,)
    edge_weight: jax.Array  # (E_pad,)
    edge_dist_norm: jax.Array  # (E_pad,)
    node_graph: jax.Array   # (N_pad,) segment id in [0, B]
    node_mask: jax.Array    # (N_pad,) float32
    edge_mask: jax.Array    # (E_pad,) float32
    graph_mask: jax.Array   # (B,) float32
    y: jax.Array            # (B, T)
    u: jax.Array            # (B, 3)
    n_node: jax.Array       # (B,) int32 true node counts
    extra: jax.Array | None = None  # (B, D) whole-structure descriptors
    # Windowed-layout extras (assemble_batch_windowed): present when the
    # batch uses the graph-aligned windowed edge order for Pallas kernels.
    # In windowed batches edge_dst is -1 on pad slots (use edge_dst_safe
    # for XLA gathers) and edges are ordered by (window, dst).
    tile_window: jax.Array | None = None  # (T,) int32 window id per edge tile
    tile_first: jax.Array | None = None   # (T,) int32 1 = first tile of window
    in_degree: jax.Array | None = None    # (N_pad,) float32 true in-degree
    window_size: int = struct.field(pytree_node=False, default=0)  # tw (static)
    # single-pass bf16 MXU aggregation (kernel_precision: "bf16") instead of
    # the f32-accurate hi/lo split — half the MXU work, ~2e-3 relative error
    kernel_bf16: bool = struct.field(pytree_node=False, default=False)
    # kernel: "fused" — CGConv runs the fused message-MLP Pallas kernel
    # (ops/pallas_fused.py): gate/core MLPs + edge basis + aggregation in
    # one MXU pass, z/gate/core/messages never hitting HBM
    kernel_fused: bool = struct.field(pytree_node=False, default=False)
    # kernel: "csr" — the sorted-side edge index ("dst" or "src") is
    # non-decreasing over real edges (per-graph sorted dataset order);
    # aggregations and sorted-side gathers run the CSR Pallas kernels
    # (ops/pallas_csr.py). in_degree holds the sorted side's per-node
    # degree (in-degree under "dst", OUT-degree under "src").
    edge_order: str | None = struct.field(pytree_node=False, default=None)

    @property
    def edge_dst_safe(self) -> jax.Array:
        """edge_dst with pad markers clipped for XLA gathers."""
        return jnp.maximum(self.edge_dst, 0)

    @property
    def dst_sorted(self) -> bool:
        return self.edge_order == "dst"

    @property
    def src_sorted(self) -> bool:
        return self.edge_order == "src"

    @property
    def is_windowed(self) -> bool:
        return self.tile_window is not None

    @property
    def num_graphs(self) -> int:
        return self.y.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_src.shape[0]


def _slot_to_graph(cum: jax.Array, num_slots: int) -> jax.Array:
    """g[s] = #{j : cum[j] <= s} for s in [0, num_slots) — identical to
    jnp.searchsorted(cum, arange(num_slots), side="right"), but as a
    B-element scatter + one cumsum instead of num_slots binary searches
    (searchsorted measured 1.5 s/epoch of the 46k packed bulk epoch,
    the single largest assembly cost — BULK.md ablation)."""
    ind = (
        jnp.zeros(num_slots + 1, jnp.int32)
        .at[jnp.minimum(cum, num_slots)]
        .add(1, mode="drop")
    )
    return jnp.cumsum(ind)[:num_slots]


def assemble_batch(data: DeviceDataset, graph_ids: jax.Array, spec: BatchSpec) -> GraphBatch:
    """Gather a padded batch from the device-resident dataset. Jit-safe:
    all shapes derive from `spec`, control flow is data-independent.

    graph_ids: (B,) int32 dataset indices; -1 marks a pad slot.
    """
    B, N, E = spec.num_graphs, spec.num_nodes, spec.num_edges
    graph_ids = jnp.asarray(graph_ids, jnp.int32)
    gmask = graph_ids >= 0
    ids = jnp.where(gmask, graph_ids, 0)

    ncounts = jnp.where(gmask, data.node_counts[ids], 0)   # (B,)
    ecounts = jnp.where(gmask, data.edge_counts[ids], 0)
    ncum = jnp.cumsum(ncounts)                              # inclusive
    ecum = jnp.cumsum(ecounts)
    n_total = ncum[-1]
    e_total = ecum[-1]
    node_off = ncum - ncounts                               # exclusive prefix

    # --- nodes -------------------------------------------------------------
    slot = jnp.arange(N, dtype=jnp.int32)
    g_of_node = _slot_to_graph(ncum, N)  # [0, B]
    node_valid = slot < n_total
    g_safe = jnp.minimum(g_of_node, B - 1)
    local = slot - node_off[g_safe]
    src_index = data.node_ptr[ids[g_safe]] + local
    src_index = jnp.where(node_valid, src_index, 0)
    x = jnp.where(node_valid[:, None], data.node_x[src_index], 0.0)
    node_graph = jnp.where(node_valid, g_of_node, B).astype(jnp.int32)

    # --- edges -------------------------------------------------------------
    eslot = jnp.arange(E, dtype=jnp.int32)
    g_of_edge = _slot_to_graph(ecum, E)
    edge_valid = eslot < e_total
    eg_safe = jnp.minimum(g_of_edge, B - 1)
    elocal = eslot - (ecum - ecounts)[eg_safe]
    e_index = data.edge_ptr[ids[eg_safe]] + elocal
    e_index = jnp.where(edge_valid, e_index, 0)
    offset = node_off[eg_safe]
    if data.edge_packed is not None:
        # One 16-byte row gather per edge (random gathers are latency-bound;
        # 4 separate per-field gathers measured 38% of the bulk epoch).
        rows = data.edge_packed[e_index]
        esrc_r, edst_r = rows[:, 0], rows[:, 1]
        ew_r = jax.lax.bitcast_convert_type(rows[:, 2], jnp.float32)
        ed_r = jax.lax.bitcast_convert_type(rows[:, 3], jnp.float32)
    else:
        esrc_r = data.edge_src[e_index]
        edst_r = data.edge_dst[e_index]
        ew_r = data.edge_weight[e_index]
        ed_r = data.edge_dist_norm[e_index]
    esrc = jnp.where(edge_valid, esrc_r + offset, 0)
    edst = jnp.where(edge_valid, edst_r + offset, 0)
    ew = jnp.where(edge_valid, ew_r, 0.0)
    ed = jnp.where(edge_valid, ed_r, 0.0)

    in_degree = None
    if data.edge_order is not None and data.node_indeg is not None:
        # the sorted side's per-node degree is a dataset constant: ride
        # the node gather (a per-assembly count scatter measured ~1 ms
        # at bin scale).
        in_degree = jnp.where(
            node_valid, data.node_indeg[src_index], 0.0
        )

    return GraphBatch(
        edge_order=data.edge_order,
        in_degree=in_degree,
        x=x,
        edge_src=esrc.astype(jnp.int32),
        edge_dst=edst.astype(jnp.int32),
        edge_weight=ew,
        edge_dist_norm=ed,
        node_graph=node_graph,
        node_mask=node_valid.astype(jnp.float32),
        edge_mask=edge_valid.astype(jnp.float32),
        graph_mask=gmask.astype(jnp.float32),
        y=data.y[ids] * gmask[:, None].astype(data.y.dtype),
        u=data.u[ids],
        n_node=ncounts.astype(jnp.int32),
        extra=None if data.extra is None else data.extra[ids],
    )


class WindowedDeviceData(struct.PyTreeNode):
    """Per-graph windowed layout arrays resident on device (companion to
    DeviceDataset; built from data/windowed.py:WindowedLayout)."""

    worder: jax.Array        # (EW_tot,) int32 graph-local edge index
    wvalid: jax.Array        # (EW_tot,) float32
    wdst: jax.Array          # (EW_tot,) int32 graph-local dst, -1 pads
    wedge_ptr: jax.Array     # (G+1,) int32
    wedge_counts: jax.Array  # (G,) int32
    tile_window: jax.Array   # (T_tot,) int32 graph-local window ids
    tile_first: jax.Array    # (T_tot,) int32
    tile_ptr: jax.Array      # (G+1,) int32
    tile_counts: jax.Array   # (G,) int32
    node_counts_w: jax.Array  # (G,) int32 window-padded node counts
    in_degree: jax.Array     # (N_tot,) float32
    wsrc: jax.Array | None = None     # (EW_tot,) int32 pre-permuted src
    wweight: jax.Array | None = None  # (EW_tot,) float32 pre-permuted weight
    wdist: jax.Array | None = None    # (EW_tot,) float32 pre-permuted dist

    @classmethod
    def from_layout(cls, layout) -> "WindowedDeviceData":
        return cls(
            worder=jnp.asarray(layout.worder, jnp.int32),
            wvalid=jnp.asarray(layout.wvalid, jnp.float32),
            wdst=jnp.asarray(layout.wdst, jnp.int32),
            wsrc=jnp.asarray(layout.wsrc, jnp.int32),
            wweight=jnp.asarray(layout.wweight, jnp.float32),
            wdist=jnp.asarray(layout.wdist, jnp.float32),
            wedge_ptr=jnp.asarray(layout.wedge_ptr, jnp.int32),
            wedge_counts=jnp.asarray(layout.wedge_counts, jnp.int32),
            tile_window=jnp.asarray(layout.tile_window, jnp.int32),
            tile_first=jnp.asarray(layout.tile_first, jnp.int32),
            tile_ptr=jnp.asarray(layout.tile_ptr, jnp.int32),
            tile_counts=jnp.asarray(layout.tile_counts, jnp.int32),
            node_counts_w=jnp.asarray(layout.node_counts_w, jnp.int32),
            in_degree=jnp.asarray(layout.in_degree, jnp.float32),
        )


def assemble_batch_windowed(
    data: DeviceDataset,
    wdata: WindowedDeviceData,
    graph_ids: jax.Array,
    spec: BatchSpec,
    tw: int,
    te: int,
    bf16: bool = False,
    fused: bool = False,
) -> GraphBatch:
    """Windowed-batch assembly: like assemble_batch but nodes occupy
    window-padded slots (graph g starts at a multiple of tw) and edges are
    in the per-graph windowed order, with -1 dst on pad slots and per-tile
    window metadata for the Pallas MXU segment-sum. All gathers, no
    scatters — jit/scan-safe.
    """
    B, N, E = spec.num_graphs, spec.num_nodes, spec.num_edges
    assert N % tw == 0 and E % te == 0
    T = E // te
    NW = N // tw
    graph_ids = jnp.asarray(graph_ids, jnp.int32)
    gmask = graph_ids >= 0
    ids = jnp.where(gmask, graph_ids, 0)

    ncounts = jnp.where(gmask, data.node_counts[ids], 0)      # real
    ncounts_w = jnp.where(gmask, wdata.node_counts_w[ids], 0)  # padded
    ncum_w = jnp.cumsum(ncounts_w)
    node_off_w = ncum_w - ncounts_w
    n_total_w = ncum_w[-1]

    # --- nodes (window-padded slots) --------------------------------------
    slot = jnp.arange(N, dtype=jnp.int32)
    g_of_node = _slot_to_graph(ncum_w, N)
    in_range = slot < n_total_w
    g_safe = jnp.minimum(g_of_node, B - 1)
    local = slot - node_off_w[g_safe]
    node_valid = in_range & (local < ncounts[g_safe])
    src_index = jnp.where(node_valid, data.node_ptr[ids[g_safe]] + local, 0)
    x = jnp.where(node_valid[:, None], data.node_x[src_index], 0.0)
    node_graph = jnp.where(node_valid, g_of_node, B).astype(jnp.int32)
    in_degree = jnp.where(node_valid, wdata.in_degree[src_index], 1.0)

    # --- edges (windowed order) -------------------------------------------
    ecounts = jnp.where(gmask, wdata.wedge_counts[ids], 0)
    ecum = jnp.cumsum(ecounts)
    edge_off = ecum - ecounts
    e_total = ecum[-1]
    eslot = jnp.arange(E, dtype=jnp.int32)
    g_of_edge = _slot_to_graph(ecum, E)
    e_in_range = eslot < e_total
    eg_safe = jnp.minimum(g_of_edge, B - 1)
    elocal = eslot - edge_off[eg_safe]
    wslot = jnp.where(e_in_range, wdata.wedge_ptr[ids[eg_safe]] + elocal, 0)
    edge_valid = e_in_range & (wdata.wvalid[wslot] > 0)
    # one-hop gathers from the pre-permuted windowed arrays (wsrc/wweight/
    # wdist baked at layout build) — the earlier slot→worder→base double
    # indirection measured 23 ms/step at bulk scale vs 9 ms for the plain
    # assembler; this removes 3 of its 6 per-edge gathers
    esrc = jnp.where(edge_valid, wdata.wsrc[wslot] + node_off_w[eg_safe], 0)
    ldst = wdata.wdst[wslot]
    edst = jnp.where(edge_valid, ldst + node_off_w[eg_safe], -1)
    ew = jnp.where(edge_valid, wdata.wweight[wslot], 0.0)
    ed = jnp.where(edge_valid, wdata.wdist[wslot], 0.0)

    # --- tiles -------------------------------------------------------------
    tcounts = jnp.where(gmask, wdata.tile_counts[ids], 0)
    tcum = jnp.cumsum(tcounts)
    tile_off = tcum - tcounts
    t_total = tcum[-1]
    tslot = jnp.arange(T, dtype=jnp.int32)
    g_of_tile = _slot_to_graph(tcum, T)
    t_in_range = tslot < t_total
    tg_safe = jnp.minimum(g_of_tile, B - 1)
    tlocal = tslot - tile_off[tg_safe]
    tidx = jnp.where(t_in_range, wdata.tile_ptr[ids[tg_safe]] + tlocal, 0)
    window_off = node_off_w // tw
    wid = wdata.tile_window[tidx] + window_off[tg_safe]
    # trailing capacity tiles: park on the last used window (their dst=-1
    # slots contribute nothing; unvisited windows are masked downstream)
    last_w = jnp.maximum(n_total_w // tw - 1, 0)
    wid = jnp.where(t_in_range, wid, last_w).astype(jnp.int32)
    wid = jnp.minimum(wid, NW - 1)
    tfirst = jnp.where(t_in_range, wdata.tile_first[tidx], 0).astype(jnp.int32)

    return GraphBatch(
        x=x,
        edge_src=esrc.astype(jnp.int32),
        edge_dst=edst.astype(jnp.int32),
        edge_weight=ew,
        edge_dist_norm=ed,
        node_graph=node_graph,
        node_mask=node_valid.astype(jnp.float32),
        edge_mask=edge_valid.astype(jnp.float32),
        graph_mask=gmask.astype(jnp.float32),
        y=data.y[ids] * gmask[:, None].astype(data.y.dtype),
        u=data.u[ids],
        n_node=ncounts.astype(jnp.int32),
        extra=None if data.extra is None else data.extra[ids],
        tile_window=wid,
        tile_first=tfirst,
        in_degree=in_degree,
        window_size=tw,
        kernel_bf16=bf16,
        kernel_fused=fused,
    )


def batch_iterator(num_graphs: int, batch_size: int, shuffle: bool, seed: int | None):
    """Host-side epoch iterator yielding (B,) int32 graph-id vectors,
    -1-padded so every step sees the same static shape. Mirrors the
    reference DataLoader semantics: shuffle per epoch, last batch partial
    (training/training.py:38; loader_setup :296-311)."""
    order = np.arange(num_graphs)
    if shuffle:
        rng = np.random.default_rng(seed)
        rng.shuffle(order)
    for start in range(0, num_graphs, batch_size):
        chunk = order[start : start + batch_size]
        if len(chunk) < batch_size:
            chunk = np.concatenate(
                [chunk, np.full(batch_size - len(chunk), -1, dtype=np.int64)]
            )
        yield chunk.astype(np.int32)


def packed_steps(indices, node_counts, edge_counts, spec: BatchSpec,
                 nominal_batch: int) -> int:
    """Static per-split step count for packed batching: enough bins that
    balanced greedy packing (max bin load <= mean load + max item) always
    fits the spec's node/edge/graph-slot capacities, for any shuffle."""
    nc = np.asarray(node_counts)[np.asarray(indices)]
    ec = np.asarray(edge_counts)[np.asarray(indices)]
    if len(nc) == 0:
        return 1
    n_bound = int(np.ceil(nc.sum() / max(spec.num_nodes - nc.max(), 1)))
    e_bound = int(np.ceil(ec.sum() / max(spec.num_edges - ec.max(), 1)))
    g_bound = int(np.ceil(len(nc) / spec.num_graphs))
    nominal = int(np.ceil(len(nc) / max(nominal_batch, 1)))
    return max(1, nominal, n_bound, e_bound, g_bound)


def packed_id_matrix(indices, node_counts, edge_counts, spec: BatchSpec,
                     nominal_batch: int, shuffle: bool, seed) -> np.ndarray:
    """(S, spec.num_graphs) id matrix via budget packing, -1 on empty slots.

    shuffle=True (training): graphs in random order are assigned to the
    least-node-loaded eligible bin of a FIXED set of S bins — max bin load
    stays within mean+max, so the spec from packed_for_dataset always
    fits and S is identical for every epoch (static fused-scan shapes).
    shuffle=False (eval): sequential fill preserving id order, so flat
    batch outputs read back in `indices` order after dropping -1 slots.
    """
    indices = np.asarray(indices, np.int64)
    nc_all = np.asarray(node_counts)
    ec_all = np.asarray(edge_counts)
    b_cap, cap_n, cap_e = spec.num_graphs, spec.num_nodes, spec.num_edges
    if len(indices) == 0:
        return np.full((1, b_cap), -1, np.int32)
    order = indices.copy()
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    steps = packed_steps(indices, node_counts, edge_counts, spec, nominal_batch)

    out = np.full((steps, b_cap), -1, np.int32)
    if not shuffle:
        j, ln, le, cnt = 0, 0, 0, 0
        for gid in order:
            n_i, e_i = int(nc_all[gid]), int(ec_all[gid])
            if cnt == b_cap or ln + n_i > cap_n or le + e_i > cap_e:
                j, ln, le, cnt = j + 1, 0, 0, 0
                if j >= steps:  # sequential fill can trail the bound
                    out = np.vstack([out, np.full((1, b_cap), -1, np.int32)])
                    steps += 1
            out[j, cnt] = gid
            ln, le, cnt = ln + n_i, le + e_i, cnt + 1
        return out

    loads_n = np.zeros(steps, np.int64)
    loads_e = np.zeros(steps, np.int64)
    counts = np.zeros(steps, np.int64)
    for gid in order:
        n_i, e_i = int(nc_all[gid]), int(ec_all[gid])
        ok = (counts < b_cap) & (loads_n + n_i <= cap_n) & (loads_e + e_i <= cap_e)
        assert ok.any(), (
            "packed batching overflow: no bin fits graph "
            f"{gid} (n={n_i}, e={e_i}) — spec {spec} too tight for this split"
        )
        j = int(np.argmin(np.where(ok, loads_n, np.iinfo(np.int64).max)))
        out[j, counts[j]] = gid
        loads_n[j] += n_i
        loads_e[j] += e_i
        counts[j] += 1
    return out


def packed_id_matrix_sharded(indices, node_counts, edge_counts,
                             spec: BatchSpec, nominal_batch: int, dp: int,
                             shuffle: bool, seed) -> np.ndarray:
    """(S, dp·B) id matrix: per-replica budget packing under a dp mesh.

    The SPMD step body reshapes each row to (dp, B) and every replica
    assembles its own batch, so each replica's B-slice must itself be a
    valid packed bin. Bin-packing is embarrassingly parallel across
    replicas: shard the (shuffled) index set contiguously into dp pieces
    (the DistributedSampler analog, reference training/training.py:292-294),
    pack each shard against the same per-replica spec, equalize step counts
    with all-pad rows, and concatenate along the slot axis. The
    count-weighted psum loss (parallel/spmd.py) makes uneven per-replica
    graph counts — including all-pad rows — exact, not approximate.
    """
    indices = np.asarray(indices, np.int64)
    if dp <= 1:
        return packed_id_matrix(indices, node_counts, edge_counts, spec,
                                nominal_batch, shuffle, seed)
    order = indices.copy()
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    shards = np.array_split(order, dp)
    mats = [
        packed_id_matrix(
            s, node_counts, edge_counts, spec, nominal_batch,
            # training: balanced-greedy pack (its internal reshuffle of an
            # already-shuffled shard stays uniform); eval: sequential fill.
            shuffle, None if seed is None else seed + 1 + r,
        )
        for r, s in enumerate(shards)
    ]
    steps = max(m.shape[0] for m in mats)
    mats = [
        np.vstack([m, np.full((steps - m.shape[0], spec.num_graphs), -1,
                              np.int32)])
        for m in mats
    ]
    return np.concatenate(mats, axis=1)
