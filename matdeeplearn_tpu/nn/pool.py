"""Graph-level pooling: global mean/add/max and Set2Set.

Replaces PyG's global_{mean,add,max}_pool and Set2Set, which the reference
resolves dynamically by name (models/cgcnn.py:150-154, 112-119). Pools run
over the padded node buffer with an explicit dummy segment for pad nodes
(id = num_graphs), then drop it.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from matdeeplearn_tpu.nn.layers import LSTMCell
from matdeeplearn_tpu.ops import segment


def global_mean_pool(x, node_graph, node_mask, num_graphs: int):
    # Stays on masked XLA segment ops BY MEASUREMENT: the CSR windowed
    # pool (ops/aggregate.py:sorted_pool — node_graph is always sorted,
    # so it needs no layout opt-in) wins op-level (~2.2 ms isolated XLA
    # pool at packed-bin shapes) but measures NEUTRAL to ×0.91 end-to-end
    # (CGCNN csr 19.71→21.57 ms fwd+bwd, MEGNet ±0.5 ms noise, r5): the
    # small pool overlaps with adjacent compute under XLA and the opaque
    # pallas_call forfeits that. Same lesson as the r2 windowed kernel.
    return segment.segment_mean(
        x, node_graph, num_segments=num_graphs + 1, mask=node_mask
    )[:num_graphs]


def global_add_pool(x, node_graph, node_mask, num_graphs: int):
    return segment.segment_sum(
        x, node_graph, num_segments=num_graphs + 1, mask=node_mask
    )[:num_graphs]


def global_max_pool(x, node_graph, node_mask, num_graphs: int):
    return segment.segment_max(
        x, node_graph, num_segments=num_graphs + 1, mask=node_mask
    )[:num_graphs]


POOLS = {
    "global_mean_pool": global_mean_pool,
    "global_add_pool": global_add_pool,
    "global_sum_pool": global_add_pool,
    "global_max_pool": global_max_pool,
}


def get_pool(name: str):
    if name not in POOLS:
        raise ValueError(f"Unknown pool '{name}' (or use set2set)")
    return POOLS[name]


class Set2Set(nn.Module):
    """Order-invariant set pooling (Vinyals et al.), PyG-parity semantics:

      q_star = 0^(B, 2d)
      for t in 1..processing_steps:
          q      = LSTM(q_star)           # input 2d → hidden d
          α_i    = softmax_i∈g(<x_i, q_g>)
          r_g    = Σ_i α_i x_i
          q_star = [q ‖ r]

    Output dim = 2 × input dim (reference handles the doubling at
    models/cgcnn.py:94-98). Pad nodes are excluded from the softmax.
    """

    dim: int
    processing_steps: int = 3

    @nn.compact
    def __call__(self, x, node_graph, node_mask, num_graphs: int):
        lstm = LSTMCell(self.dim, name="lstm")
        B = num_graphs
        q_star = jnp.zeros((B, 2 * self.dim), x.dtype)
        h = jnp.zeros((B, self.dim), x.dtype)
        c = jnp.zeros((B, self.dim), x.dtype)
        ng = jnp.minimum(node_graph, B - 1)  # pad nodes: masked anyway
        for _ in range(self.processing_steps):
            q, c = lstm(q_star, h, c)
            h = q
            e = jnp.sum(x * q[ng], axis=-1, keepdims=True)
            a = segment.segment_softmax(
                e, node_graph, num_segments=B + 1, mask=node_mask
            )
            r = segment.segment_sum(
                a * x, node_graph, num_segments=B + 1, mask=node_mask
            )[:B]
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star
