"""matdeeplearn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) materials GNN framework.

A from-scratch re-design of the capabilities of Fung-Lab/MatDeepLearn
(reference layout: matdeeplearn/{process,models,training} + main.py) built
TPU-first:

- static-shape padded graph batches assembled *on device* under jit
  (host only ships a handful of int32 indices per step),
- segment reductions via XLA segment ops and Pallas TPU kernels,
- functional models (flax.linen) with pad-mask-aware BatchNorm/pool semantics,
- pjit/shard_map data- and edge-parallelism over a jax.sharding.Mesh,
- optax-based training with reference-parity optimizer/scheduler behavior.
"""

__version__ = "0.1.0"

from matdeeplearn_tpu import data, models, nn, ops, training, parallel, utils  # noqa: F401
