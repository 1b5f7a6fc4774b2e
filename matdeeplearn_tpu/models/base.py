"""Shared GNN skeleton: pre-FC → conv stack → pool → post-FC → output.

Every reference GNN follows the same frame (e.g. models/cgcnn.py:46-174):
`pre_fc_count` dense layers, `gc_count` conv blocks with optional BatchNorm
and dropout, early/late pooling (name-resolved pool or Set2Set with doubled
width), `post_fc_count` dense layers, a final `lin_out`, and a squeeze to
(B,) for single targets. Subclasses implement only the conv stack.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from matdeeplearn_tpu.data.batching import GraphBatch
from matdeeplearn_tpu.nn.layers import Linear, get_activation
from matdeeplearn_tpu.nn.pool import Set2Set, get_pool
from matdeeplearn_tpu.ops import gaussian_basis


class GNNBase(nn.Module):
    """Mixin with the shared skeleton pieces. Subclasses declare the config
    fields and call these helpers from their compact __call__."""

    # Subclasses must define these dataclass fields:
    #   num_features, dim1, dim2, pre_fc_count, gc_count, post_fc_count,
    #   pool, pool_order, batch_norm, batch_track_stats, act, dropout_rate,
    #   output_dim, edge_resolution, edge_width, precision, remat
    #
    # remat=True wraps each conv block in jax.checkpoint (flax nn.remat):
    # the backward recomputes conv activations instead of storing per-layer
    # (E, 2D+De)-scale residuals — trades ~1 extra forward for O(layers)
    # less HBM, the standard TPU recipe for memory-bound batch sizes.

    @property
    def compute_dtype(self):
        """Activation dtype. precision="bf16" runs the conv/FC stacks in
        bf16 on the MXU (f32 master params, f32 matmul accumulation, f32
        BatchNorm stats and segment-sum accumulators, f32 loss) — the TPU
        mixed-precision recipe. Default "f32" is bit-identical to r2."""
        return (jnp.bfloat16 if getattr(self, "precision", "f32") == "bf16"
                else jnp.float32)

    def edge_features(self, batch: GraphBatch):
        """On-device Gaussian expansion of stored normalized distances."""
        return gaussian_basis(
            batch.edge_dist_norm, 0.0, 1.0, self.edge_resolution, self.edge_width
        ).astype(self.compute_dtype)

    @property
    def gc_dim(self) -> int:
        return self.num_features if self.pre_fc_count == 0 else self.dim1

    @property
    def post_fc_dim(self) -> int:
        return self.num_features if self.pre_fc_count == 0 else self.dim1

    def apply_pre_fc(self, x):
        x = x.astype(self.compute_dtype)
        fn = get_activation(self.act)
        for i in range(self.pre_fc_count):
            x = Linear(self.dim1, name=f"pre_lin{i}")(x)
            x = fn(x)
        return x

    def _pool(self, out, batch: GraphBatch, dim: int, prefix: str = ""):
        if self.pool == "set2set":
            return Set2Set(dim, processing_steps=3, name=f"{prefix}set2set")(
                out, batch.node_graph, batch.node_mask, batch.num_graphs
            )
        return get_pool(self.pool)(
            out, batch.node_graph, batch.node_mask, batch.num_graphs
        )

    def apply_head(self, out, batch: GraphBatch, pooled_dim: int | None = None):
        """Early/late pooling + post-FC stack + lin_out (+ squeeze)."""
        fn = get_activation(self.act)
        pooled_dim = pooled_dim if pooled_dim is not None else self.post_fc_dim

        if self.pool_order == "early":
            out = self._pool(out, batch, pooled_dim)
            # Graph embedding = input of the first post-FC layer, matching the
            # reference analysis hook on post_lin_list[0] (training.py:1236-1237).
            self.sow("intermediates", "graph_embedding", out)
            for i in range(self.post_fc_count):
                out = Linear(self.dim2, name=f"post_lin{i}")(out)
                out = fn(out)
            out = Linear(self.output_dim, name="lin_out")(out)
        else:  # late
            self.sow("intermediates", "graph_embedding", out)
            for i in range(self.post_fc_count):
                out = Linear(self.dim2, name=f"post_lin{i}")(out)
                out = fn(out)
            out = Linear(self.output_dim, name="lin_out")(out)
            if self.pool == "set2set":
                out = Set2Set(self.output_dim, processing_steps=3, name="set2set")(
                    out, batch.node_graph, batch.node_mask, batch.num_graphs
                )
                out = Linear(self.output_dim, name="lin_out_2")(out)
            else:
                out = get_pool(self.pool)(
                    out, batch.node_graph, batch.node_mask, batch.num_graphs
                )

        out = out.astype(jnp.float32)  # predictions/loss always f32
        if out.shape[-1] == 1:
            return out.reshape(-1)
        return out


COMMON_FIELDS = dict(
    num_features=114,
    dim1=64,
    dim2=64,
    pre_fc_count=1,
    gc_count=3,
    post_fc_count=1,
    pool="global_mean_pool",
    pool_order="early",
    batch_norm=True,
    batch_track_stats=True,
    act="relu",
    dropout_rate=0.0,
    output_dim=1,
    edge_resolution=50,
    edge_width=0.2,
    precision="f32",
    remat=False,
)
