"""Device mesh construction.

The reference's only scaling strategy is single-host DDP over NCCL
(training/training.py:227-237, main.py:274-285). The TPU-native equivalent
is a jax.sharding.Mesh with two axes:

  dp — data parallelism over graphs (the DDP analog; gradients combine via
       XLA collectives over ICI instead of NCCL ring all-reduce)
  ep — edge parallelism: the padded edge dimension of each batch is sharded
       so message/filter MLPs (the FLOP-dominant work) split across chips —
       the graph analog of tensor/sequence parallelism (SURVEY.md §2.4).

Multi-host: jax.distributed.initialize() makes jax.devices() span hosts;
the same mesh code then lays dp over the DCN axis automatically.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, ep: int = 1, devices=None) -> Mesh:
    """Build a (dp, ep) mesh. dp=None uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % ep == 0, f"{n} devices not divisible by ep={ep}"
        dp = n // ep
    assert dp * ep <= n, f"need {dp * ep} devices, have {n}"
    arr = np.array(devices[: dp * ep]).reshape(dp, ep)
    return Mesh(arr, axis_names=("dp", "ep"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over dp (per-replica batches)."""
    return NamedSharding(mesh, P("dp"))
