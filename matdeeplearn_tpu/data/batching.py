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
    def for_dataset(cls, node_counts, edge_counts, batch_size: int, align: int = 8):
        """Tight upper bound over any batch of `batch_size` graphs: the sum of
        the `batch_size` largest node/edge counts, aligned for TPU tiling.
        Guarantees zero recompilation and zero overflow for any shuffle."""
        b = min(batch_size, len(node_counts))
        n = int(np.sort(np.asarray(node_counts))[-b:].sum())
        e = int(np.sort(np.asarray(edge_counts))[-b:].sum())
        return cls(batch_size, round_up(max(n, 1), align), round_up(max(e, 1), align))


class DeviceDataset(struct.PyTreeNode):
    """Featurized dataset resident in device memory (HBM)."""

    node_x: jax.Array        # (N, F) float32
    edge_src: jax.Array      # (E,) int32 graph-local
    edge_dst: jax.Array      # (E,) int32 graph-local
    edge_weight: jax.Array   # (E,) float32 raw distance
    edge_dist_norm: jax.Array  # (E,) float32
    node_ptr: jax.Array      # (G+1,) int32
    edge_ptr: jax.Array      # (G+1,) int32
    node_counts: jax.Array   # (G,) int32
    edge_counts: jax.Array   # (G,) int32
    y: jax.Array             # (G, T) float32 — after target-index selection
    u: jax.Array             # (G, 3) float32
    extra: jax.Array | None = None  # (G, D) whole-structure descriptors (SOAP/SM)

    @classmethod
    def from_graph_dataset(cls, ds, extra_key: str | None = None) -> "DeviceDataset":
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
        return cls(
            extra=extra,
            node_x=jnp.asarray(ds.node_x, jnp.float32),
            edge_src=jnp.asarray(ds.edge_src, jnp.int32),
            edge_dst=jnp.asarray(ds.edge_dst, jnp.int32),
            edge_weight=jnp.asarray(ds.edge_weight, jnp.float32),
            edge_dist_norm=jnp.asarray(ds.edge_dist_norm, jnp.float32),
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

    @property
    def num_graphs(self) -> int:
        return self.y.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_src.shape[0]


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
    g_of_node = jnp.searchsorted(ncum, slot, side="right").astype(jnp.int32)  # [0, B]
    node_valid = slot < n_total
    g_safe = jnp.minimum(g_of_node, B - 1)
    local = slot - node_off[g_safe]
    src_index = data.node_ptr[ids[g_safe]] + local
    src_index = jnp.where(node_valid, src_index, 0)
    x = jnp.where(node_valid[:, None], data.node_x[src_index], 0.0)
    node_graph = jnp.where(node_valid, g_of_node, B).astype(jnp.int32)

    # --- edges -------------------------------------------------------------
    eslot = jnp.arange(E, dtype=jnp.int32)
    g_of_edge = jnp.searchsorted(ecum, eslot, side="right").astype(jnp.int32)
    edge_valid = eslot < e_total
    eg_safe = jnp.minimum(g_of_edge, B - 1)
    elocal = eslot - (ecum - ecounts)[eg_safe]
    e_index = data.edge_ptr[ids[eg_safe]] + elocal
    e_index = jnp.where(edge_valid, e_index, 0)
    offset = node_off[eg_safe]
    esrc = jnp.where(edge_valid, data.edge_src[e_index] + offset, 0)
    edst = jnp.where(edge_valid, data.edge_dst[e_index] + offset, 0)
    ew = jnp.where(edge_valid, data.edge_weight[e_index], 0.0)
    ed = jnp.where(edge_valid, data.edge_dist_norm[e_index], 0.0)

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
