"""Edge→node aggregation dispatch: Pallas windowed MXU kernel or XLA.

Single entry point used by every conv primitive. When the batch carries
the graph-aligned windowed layout (data/batching.py:assemble_batch_windowed)
the reduction runs as one-hot MXU matmuls (ops/pallas_segment.py, ~3.5x
faster than XLA's scatter at production edge counts, backward included via
custom VJP); otherwise it falls back to the masked XLA segment ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matdeeplearn_tpu.ops import pallas_segment as PS
from matdeeplearn_tpu.ops import segment


def edge_aggregate(messages, batch, reduce: str = "sum"):
    """Aggregate per-edge `messages` (E, D) at destination nodes → (N, D).

    reduce: "sum" | "mean" (mean divides by the true in-degree, matching
    torch_scatter's aggr="mean" with our always-present self-loops).
    """
    n = batch.num_nodes
    if batch.is_windowed:
        interpret = jax.default_backend() != "tpu"
        in_manual = bool(getattr(jax.typeof(messages), "vma", frozenset()))
        if interpret and in_manual:
            # Interpret-mode pallas_call inside a manual shard_map region
            # trips a jax-0.9 lowering-cache bug; run the (numerically
            # identical) masked XLA reduction on the windowed layout there.
            # Real TPU always takes the kernel below.
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
            out = PS.windowed_segment_sum(
                messages, we, n, batch.window_size, te, interpret
            )
        # Windows with no tiles (pad node region) are never written by the
        # kernel; mask them off so downstream masked reductions stay finite.
        out = jnp.where(batch.node_mask[:, None] > 0, out, 0.0)
        if reduce == "mean":
            out = out / jnp.maximum(batch.in_degree, 1.0)[:, None]
        return out

    if reduce == "mean":
        return segment.segment_mean(
            messages, batch.edge_dst, num_segments=n, mask=batch.edge_mask
        )
    return segment.segment_sum(
        messages, batch.edge_dst, num_segments=n, mask=batch.edge_mask
    )
