"""GCN — weighted graph convolution (reference: models/gcn.py).

Per layer: GCNConv(edge_weight-normalized) → BatchNorm? → act → dropout
(activation after every conv, gcn.py:145). Uses the raw distances as edge
weights (data.edge_weight, unnormalized).
"""

from __future__ import annotations

from flax import linen as nn

from matdeeplearn_tpu.data.batching import GraphBatch
from matdeeplearn_tpu.models.base import GNNBase
from matdeeplearn_tpu.nn.conv import GCNConv
from matdeeplearn_tpu.nn.layers import MaskedBatchNorm, get_activation


class GCN(GNNBase):
    num_features: int = 114
    dim1: int = 64
    dim2: int = 64
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

    @nn.compact
    def __call__(self, batch: GraphBatch, training: bool = False):
        fn = get_activation(self.act)
        out = self.apply_pre_fc(batch.x)
        conv_cls = nn.remat(GCNConv) if self.remat else GCNConv
        for i in range(self.gc_count):
            out = conv_cls(self.gc_dim, name=f"conv{i}")(out, batch)
            if self.batch_norm:
                out = MaskedBatchNorm(
                    track_stats=self.batch_track_stats, name=f"bn{i}"
                )(out, mask=batch.node_mask, use_running_average=not training)
            out = fn(out)
            if self.dropout_rate > 0:
                out = nn.Dropout(self.dropout_rate, deterministic=not training)(out)
        return self.apply_head(out, batch)
