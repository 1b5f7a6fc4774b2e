"""SchNet — continuous-filter convolutions (reference: models/schnet.py).

Per layer: out = out + InteractionBlock(out, edges) (residual add,
schnet.py:134-143) → BatchNorm? → dropout. No inter-conv activation.
The cosine cutoff acts on the *raw* edge distance (data.edge_weight stays
unnormalized in the reference — process.py:305 vs 647).
"""

from __future__ import annotations

from flax import linen as nn

from matdeeplearn_tpu.data.batching import GraphBatch
from matdeeplearn_tpu.models.base import GNNBase
from matdeeplearn_tpu.nn.conv import SchNetInteraction
from matdeeplearn_tpu.nn.layers import MaskedBatchNorm


class SchNet(GNNBase):
    num_features: int = 114
    dim1: int = 64
    dim2: int = 64
    dim3: int = 64
    cutoff: float = 8.0
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
        edge_attr = self.edge_features(batch)
        out = self.apply_pre_fc(batch.x)
        conv_cls = (nn.remat(SchNetInteraction) if self.remat
                    else SchNetInteraction)
        for i in range(self.gc_count):
            out = out + conv_cls(
                self.gc_dim, self.dim3, self.cutoff,
                edge_width=self.edge_width, name=f"conv{i}"
            )(out, batch, edge_attr)
            if self.batch_norm:
                out = MaskedBatchNorm(
                    track_stats=self.batch_track_stats, name=f"bn{i}"
                )(out, mask=batch.node_mask, use_running_average=not training)
            if self.dropout_rate > 0:
                out = nn.Dropout(self.dropout_rate, deterministic=not training)(out)
        return self.apply_head(out, batch)
