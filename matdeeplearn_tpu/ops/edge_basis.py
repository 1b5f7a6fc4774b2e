"""On-device Gaussian edge-basis expansion.

The reference materializes 50-channel Gaussian edge features on the host at
preprocessing time (process.py:580-590, 506-509). On TPU we expand the
stored scalar normalized distance inside the jitted step instead: a single
fused VPU op, trading ~50x of HBM traffic and dataset size for negligible
FLOPs. Numerics are identical to data/graphs.py:gaussian_basis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_basis(
    dist: jax.Array,
    start: float = 0.0,
    stop: float = 1.0,
    resolution: int = 50,
    width: float = 0.2,
) -> jax.Array:
    """(E,) scalar distances → (E, resolution) Gaussian features.

    coeff = -0.5 / ((stop - start) * width)^2, offsets linspace(start, stop)
    — the exact reference formula (process.py:583-590).
    """
    offsets = jnp.linspace(start, stop, resolution, dtype=dist.dtype)
    coeff = -0.5 / ((stop - start) * width) ** 2
    diff = dist[..., None] - offsets
    return jnp.exp(coeff * diff * diff)
