"""SM / SOAP descriptor MLP heads (reference: models/descriptor_nn.py).

Plain MLPs over whole-structure descriptor vectors (batch.extra):
ReLU(lin1) → fc_count × ReLU(lin) → lin2 → squeeze.
"""

from __future__ import annotations

from flax import linen as nn
import jax.nn as jnn
import jax.numpy as jnp

from matdeeplearn_tpu.data.batching import GraphBatch
from matdeeplearn_tpu.nn.layers import Linear


class _DescriptorNN(nn.Module):
    dim1: int = 64
    fc_count: int = 1
    output_dim: int = 1
    precision: str = "f32"

    @nn.compact
    def __call__(self, batch: GraphBatch, training: bool = False):
        assert batch.extra is not None, (
            "descriptor models need extra features; enable SOAP_descriptor/"
            "SM_descriptor in Processing config"
        )
        dt = jnp.bfloat16 if self.precision == "bf16" else jnp.float32
        out = jnn.relu(Linear(self.dim1, name="lin1")(batch.extra.astype(dt)))
        for i in range(self.fc_count):
            out = jnn.relu(Linear(self.dim1, name=f"lin_list{i}")(out))
        out = Linear(self.output_dim, name="lin2")(out).astype(jnp.float32)
        if out.shape[-1] == 1:
            return out.reshape(-1)
        return out


class SM(_DescriptorNN):
    pass


class SOAP(_DescriptorNN):
    pass
