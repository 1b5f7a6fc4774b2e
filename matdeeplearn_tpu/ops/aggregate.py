"""Edge→node aggregation dispatch: Pallas windowed MXU kernel or XLA.

Single entry point used by every conv primitive. When the batch carries
the graph-aligned windowed layout (data/batching.py:assemble_batch_windowed)
the reduction runs as one-hot MXU matmuls (ops/pallas_segment.py — x1.6-2.8
faster than XLA's scatter in isolation at 262k-1M edges on v5e, but
measured slower end-to-end in fused training; see KERNELS.md, so the
windowed path is an explicit opt-in). Default: masked XLA segment ops.

Inside a manual shard_map region where the batch's edge arrays are sharded
over the ep mesh axis (parallel/spmd.py ep_mode="ring"), each device reduces
its local edge shard and the boundary-node partials are combined with a
reduce-scatter + all-gather halo exchange (parallel/ring.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matdeeplearn_tpu.ops import pallas_csr as PC
from matdeeplearn_tpu.ops import pallas_segment as PS
from matdeeplearn_tpu.ops import segment


def _ring():
    # Lazy: parallel/__init__ pulls in spmd -> training -> models -> ops.
    from matdeeplearn_tpu.parallel import ring

    return ring


def edge_aggregate(messages, batch, reduce: str = "sum", weights=None):
    """Aggregate per-edge `messages` (E, D) at destination nodes → (N, D).

    reduce: "sum" | "mean" (mean divides by the true in-degree, matching
    torch_scatter's aggr="mean" with our always-present self-loops).

    weights: optional (E,) per-edge scalars folded into the reduction —
    out[n] = Σ w[e]·msg[e]. On the windowed path this is a fused SpMM
    (ops/pallas_segment.py:windowed_spmm): the multiply rides the kernel's
    VPU, so the scaled messages never round-trip through HBM. Used by
    GCN's normalized aggregation (the torch_sparse SpMM role).
    """
    n = batch.num_nodes
    ring = _ring()
    if ring.is_edge_sharded(messages):
        # Edge-partitioned path: local partial reduction, then halo exchange.
        # (Windowed layouts are never edge-sharded — jobs.py keeps the Pallas
        # kernel single-shard.)
        if weights is not None:
            messages = messages * weights.astype(messages.dtype)[:, None]
        total = segment.segment_sum(
            messages, batch.edge_dst_safe, num_segments=n, mask=batch.edge_mask
        )
        total = ring.halo_exchange_sum(total)
        if reduce == "mean":
            count = segment.segment_count(
                batch.edge_dst_safe, num_segments=n, mask=batch.edge_mask
            )
            count = ring.halo_exchange_sum(count)
            total = (total.astype(jnp.float32)
                     / jnp.maximum(count, 1.0)[:, None]).astype(messages.dtype)
        return total

    if batch.is_windowed:
        # The windowed kernels run f32 (or their own hi/lo-bf16 mode via
        # kernel_precision); bf16 activations round-trip through f32 here.
        mdtype = messages.dtype
        if mdtype == jnp.bfloat16:
            messages = messages.astype(jnp.float32)
        interpret = jax.default_backend() != "tpu"
        in_manual = bool(getattr(jax.typeof(messages), "vma", frozenset()))
        if interpret and in_manual:
            # Interpret-mode pallas_call inside a manual shard_map region
            # trips a jax-0.9 lowering-cache bug; run the (numerically
            # identical) masked XLA reduction on the windowed layout there.
            # Real TPU always takes the kernel below.
            if weights is not None:
                messages = messages * weights[:, None]
            out = segment.segment_sum(
                messages, jnp.maximum(batch.edge_dst, 0),
                num_segments=n, mask=batch.edge_mask,
            )
        else:
            te = batch.num_edges // batch.tile_window.shape[0]
            we = PS.WindowedEdges(
                order=batch.edge_dst,  # unused by the kernels
                dst=batch.edge_dst,
                window_id=batch.tile_window,
                first_tile=batch.tile_first,
                valid=batch.edge_mask,
            )
            hilo = not batch.kernel_bf16
            if weights is not None:
                out = PS.windowed_spmm(
                    weights, messages, we, n, batch.window_size, te, interpret,
                    hilo,
                )
            else:
                out = PS.windowed_segment_sum(
                    messages, we, n, batch.window_size, te, interpret, hilo
                )
        # Windows with no tiles (pad node region) are never written by the
        # kernel; mask them off so downstream masked reductions stay finite.
        out = jnp.where(batch.node_mask[:, None] > 0, out, 0.0)
        if reduce == "mean":
            out = out / jnp.maximum(batch.in_degree, 1.0)[:, None]
        return out.astype(mdtype)

    if getattr(batch, "dst_sorted", False) and messages.shape[-1] >= 8:
        # CSR Pallas path (kernel: csr): edge_dst is non-decreasing by the
        # dataset's per-graph dst-sort, so the scatter runs as a sequential
        # windowed one-hot MXU reduce (ops/pallas_csr.py) instead of XLA's
        # per-row-latency-bound scatter (~27 GB/s, BULK.md r4). Narrow
        # (D<8) reductions stay XLA — the 128-lane one-hot matmul wastes
        # more than the scatter costs there.
        mdtype = messages.dtype
        m32 = messages.astype(jnp.float32)
        if weights is not None:
            m32 = m32 * weights.astype(jnp.float32)[:, None]
        interpret = jax.default_backend() != "tpu"
        out = PC.sorted_segment_sum(
            m32, batch.edge_dst, batch.edge_mask, n,
            PC.DEFAULT_TE, interpret, not batch.kernel_bf16,
        )
        if reduce == "mean":
            deg = (batch.in_degree if batch.in_degree is not None
                   else segment.segment_count(
                       batch.edge_dst, n, mask=batch.edge_mask))
            out = jnp.where(deg[:, None] > 0, out / jnp.maximum(deg, 1.0)[:, None], 0.0)
        return out.astype(mdtype)

    if weights is not None:
        messages = messages * weights.astype(messages.dtype)[:, None]
    if reduce == "mean":
        return segment.segment_mean(
            messages, batch.edge_dst, num_segments=n, mask=batch.edge_mask
        )
    return segment.segment_sum(
        messages, batch.edge_dst, num_segments=n, mask=batch.edge_mask
    )


def sorted_pool(x, node_graph, node_mask, num_graphs: int,
                reduce: str = "mean"):
    """node→graph pooling on the CSR kernel (sum | mean) — a MEASURED
    NEGATIVE kept as tested documentation-by-code, NOT wired into any
    model (r5).

    The idea: `node_graph` is non-decreasing in EVERY assembled batch
    (nodes are laid out per graph in slot order, pads in the dummy tail
    segment) and real graphs occupy prefix slots hole-free — the CSR
    contract with no layout opt-in — and the isolated XLA pool costs
    ~2.2 ms at packed-bin shapes (bench_megnet_decomp.py). For `mean` a
    ones-column rides the same kernel pass (lane padding makes D+1
    free), so counts cost no second scatter.

    The measurement: e2e fwd+bwd at packed-bin shapes, one v5e —
    CGCNN csr-agg 19.71 (XLA pool) vs 21.57 ms (this), MEGNet ±0.5 ms
    noise both ways. XLA overlaps the small pool with adjacent compute;
    the opaque pallas_call forfeits that and the cond/certificate adds
    elementwise work — the r2 windowed-kernel lesson at pool scale.
    Models therefore keep the masked XLA segment ops (nn/pool.py).
    """
    d = x.shape[-1]
    if jax.default_backend() != "tpu" or d < 8:
        fn = (segment.segment_mean if reduce == "mean"
              else segment.segment_sum)
        return fn(x, node_graph, num_segments=num_graphs + 1,
                  mask=node_mask)[:num_graphs]
    xdtype = x.dtype
    if reduce == "mean":
        xx = jnp.concatenate(
            [x.astype(jnp.float32),
             jnp.ones((x.shape[0], 1), jnp.float32)], axis=-1)
        out = PC.sorted_segment_sum(
            xx, node_graph, node_mask, num_graphs + 1,
            PC.DEFAULT_TE, False, True)
        s, c = out[:num_graphs, :d], out[:num_graphs, d]
        return (s / jnp.maximum(c, 1.0)[:, None]).astype(xdtype)
    out = PC.sorted_segment_sum(
        x.astype(jnp.float32), node_graph, node_mask, num_graphs + 1,
        PC.DEFAULT_TE, False, True)
    return out[:num_graphs].astype(xdtype)


def gather_src(x, batch):
    """x[edge_src] for message construction — the CSR sorted-gather when
    the batch is SRC-sorted (edge_order: "src", MEGNet's csr layout; VJP
    = CSR scatter-add at src), plain XLA `take` otherwise. Mirrors
    gather_dst for the opposite side."""
    ring = _ring()
    if (getattr(batch, "src_sorted", False) and x.shape[-1] >= 8
            and not ring.is_edge_sharded(batch.edge_src)):
        xdtype = x.dtype
        interpret = jax.default_backend() != "tpu"
        out = PC.sorted_gather(
            x.astype(jnp.float32), batch.edge_src, batch.edge_mask,
            batch.num_nodes, PC.DEFAULT_TE, interpret,
            not batch.kernel_bf16,
        )
        return out.astype(xdtype)
    return x[batch.edge_src]


def gather_edge_graph(u, edge_graph, batch, num_graphs: int):
    """u[edge_graph] — the per-edge graph-feature broadcast (MEGNet's u
    into comb_e). edge_graph = node_graph[edge_src] is non-decreasing
    when the batch is src-sorted (node_graph is non-decreasing and src
    is sorted), so the CSR gather runs it; XLA take otherwise or for
    narrow u."""
    ring = _ring()
    if (getattr(batch, "src_sorted", False) and u.shape[-1] >= 8
            and not ring.is_edge_sharded(edge_graph)):
        udtype = u.dtype
        interpret = jax.default_backend() != "tpu"
        out = PC.sorted_gather(
            u.astype(jnp.float32), edge_graph, batch.edge_mask,
            num_graphs, PC.DEFAULT_TE, interpret, not batch.kernel_bf16,
        )
        return out.astype(udtype)
    return u[jnp.minimum(edge_graph, num_graphs - 1)]


def src_segment_mean(values, batch):
    """mean of per-edge `values` at the SOURCE node — MEGNet's edge→node
    aggregation direction (megnet.py:86/130). Under edge_order "src" the
    CSR segment-sum runs it (batch.in_degree holds the OUT-degree there);
    otherwise the ep-aware XLA mean."""
    ring = _ring()
    if (getattr(batch, "src_sorted", False) and values.shape[-1] >= 8
            and not ring.is_edge_sharded(values)):
        vdtype = values.dtype
        interpret = jax.default_backend() != "tpu"
        out = PC.sorted_segment_sum(
            values.astype(jnp.float32), batch.edge_src, batch.edge_mask,
            batch.num_nodes, PC.DEFAULT_TE, interpret,
            not batch.kernel_bf16,
        )
        deg = (batch.in_degree if batch.in_degree is not None
               else segment.segment_count(
                   batch.edge_src, batch.num_nodes, mask=batch.edge_mask))
        out = jnp.where(deg[:, None] > 0,
                        out / jnp.maximum(deg, 1.0)[:, None], 0.0)
        return out.astype(vdtype)
    return edge_segment_mean(values, batch.edge_src,
                             num_segments=batch.num_nodes,
                             mask=batch.edge_mask)


def gather_dst(x, batch):
    """x[edge_dst] for message construction (CGConv's x_i, MEGNet's
    dst-side features) — the CSR sorted-gather when the batch is
    dst-sorted (VJP = CSR scatter-add; ops/pallas_csr.py), plain XLA
    `take` otherwise. Pad edges return zero rows on the CSR path and
    row-0 features (masked downstream) on the XLA path — every caller
    multiplies messages by edge_mask before aggregation either way."""
    ring = _ring()
    if (getattr(batch, "dst_sorted", False) and x.shape[-1] >= 8
            and not ring.is_edge_sharded(batch.edge_dst)):
        xdtype = x.dtype
        interpret = jax.default_backend() != "tpu"
        out = PC.sorted_gather(
            x.astype(jnp.float32), batch.edge_dst, batch.edge_mask,
            batch.num_nodes, PC.DEFAULT_TE, interpret,
            not batch.kernel_bf16,
        )
        return out.astype(xdtype)
    return x[batch.edge_dst_safe]


def edge_segment_mean(values, segment_ids, num_segments, mask):
    """Mean of edge-sharded `values` at `segment_ids` — the ep-aware analog
    of ops.segment.segment_mean for callers that aggregate edge features at
    arbitrary node ids (MEGNet's source-side means, nn/conv.py MetaLayer).
    Outside a manual ep region this is exactly segment_mean."""
    ring = _ring()
    if not ring.is_edge_sharded(values):
        return segment.segment_mean(
            values, segment_ids, num_segments=num_segments, mask=mask
        )
    total = segment.segment_sum(
        values, segment_ids, num_segments=num_segments, mask=mask
    )
    count = segment.segment_count(segment_ids, num_segments=num_segments, mask=mask)
    total = ring.halo_exchange_sum(total)
    count = ring.halo_exchange_sum(count)
    count = count.reshape(count.shape + (1,) * (total.ndim - count.ndim))
    return total / jnp.maximum(count, 1.0)


def edge_segment_reduce(kind: str, values, segment_ids, num_segments, mask):
    """Ep-aware sum/mean/max of edge-sharded `values` at node ids (MEGNet's
    edge→source-node pooling, models/megnet.py readout). `kind` mirrors the
    torch_scatter reduce names the reference pool map uses."""
    ring = _ring()
    if kind == "mean":
        return edge_segment_mean(values, segment_ids, num_segments, mask)
    if not ring.is_edge_sharded(values):
        fn = segment.segment_sum if kind in ("sum", "add") else segment.segment_max
        return fn(values, segment_ids, num_segments=num_segments, mask=mask)
    if kind in ("sum", "add"):
        local = segment.segment_sum(
            values, segment_ids, num_segments=num_segments, mask=mask
        )
        return ring.halo_exchange_sum(local)
    # max: exchange BEFORE the empty→0 clamp (torch_scatter zero-init
    # semantics) — a segment whose edges all live on another shard must take
    # that shard's (possibly negative) max, not 0.
    neg = jnp.asarray(-jnp.inf, values.dtype)
    m = mask.astype(bool).reshape(mask.shape + (1,) * (values.ndim - mask.ndim))
    local = jax.ops.segment_max(
        jnp.where(m, values, neg), segment_ids, num_segments=num_segments
    )
    # all_gather + max rather than pmax: pmax has no differentiation rule,
    # while all_gather transposes to psum_scatter and jnp.max subgradients
    # route the cotangent to the winning shard.
    out = jnp.max(jax.lax.all_gather(local, ring.EP_AXIS), axis=0)
    return jnp.where(jnp.isfinite(out), out, 0.0)
