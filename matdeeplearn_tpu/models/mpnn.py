"""MPNN — edge-conditioned conv + per-layer GRU (reference: models/mpnn.py).

Per layer: m = NNConv(out) → BatchNorm? → act → dropout;
out = h = GRU(m, h) with hidden state h threaded across all conv layers
(mpnn.py:141-161; torch GRU over length-1 sequences ≡ a GRU cell).
"""

from __future__ import annotations

import jax
from flax import linen as nn

from matdeeplearn_tpu.data.batching import GraphBatch
from matdeeplearn_tpu.models.base import GNNBase
from matdeeplearn_tpu.nn.conv import NNConv, _EdgeNetFactored
from matdeeplearn_tpu.nn.layers import GRUCell, MaskedBatchNorm, get_activation


class MPNN(GNNBase):
    num_features: int = 114
    dim1: int = 64
    dim2: int = 64
    dim3: int = 64
    pre_fc_count: int = 1
    gc_count: int = 3
    post_fc_count: int = 1
    pool: str = "global_mean_pool"
    pool_order: str = "early"
    batch_norm: bool = True
    batch_track_stats: bool = True
    act: str = "relu"
    dropout_rate: float = 0.0
    output_dim: int = 1
    edge_resolution: int = 50
    edge_width: float = 0.2
    precision: str = "f32"
    remat: bool = False
    # kernel="auto"/"fused" routes NNConv's bilinear message through the
    # Pallas VMEM kernel on TPU (ops/pallas_bilinear.py, measured ×2.0 at
    # bulk scale); "xla" keeps the einsum path. Layout-independent — no
    # windowed batching needed, so auto is safe for every batching mode.
    kernel: str = "auto"

    @nn.compact
    def __call__(self, batch: GraphBatch, training: bool = False):
        edge_attr = self.edge_features(batch)
        fn = get_activation(self.act)
        out = self.apply_pre_fc(batch.x)
        h = out
        conv_cls = nn.remat(NNConv) if self.remat else NNConv
        fused_msg = (
            # "csr" composes: CSR aggregation (ops/pallas_csr.py) and the
            # bilinear message kernel are independent — both run together.
            str(self.kernel).lower() in ("auto", "fused", "pallas", "csr")
            and jax.default_backend() == "tpu"
        )
        for i in range(self.gc_count):
            # Edge network: Linear(edge_dim, dim3) → ReLU → Linear(dim3, d²)
            # (mpnn.py:83-85); factored form exposes the second layer's
            # weights for the fused bilinear kernel (identical param tree).
            edge_net = _EdgeNetFactored(
                self.dim3, self.gc_dim * self.gc_dim,
                act="relu",
                name=f"edge_nn{i}",
            )
            m = conv_cls(self.gc_dim, edge_net, fused=fused_msg,
                         name=f"conv{i}")(out, batch, edge_attr)
            if self.batch_norm:
                m = MaskedBatchNorm(
                    track_stats=self.batch_track_stats, name=f"bn{i}"
                )(m, mask=batch.node_mask, use_running_average=not training)
            m = fn(m)
            if self.dropout_rate > 0:
                m = nn.Dropout(self.dropout_rate, deterministic=not training)(m)
            h = GRUCell(self.gc_dim, name=f"gru{i}")(m, h)
            out = h
        return self.apply_head(out, batch)
