"""Masked segment reductions — the TPU equivalent of torch_scatter.

The reference delegates all message aggregation and per-crystal pooling to
torch_scatter's C++/CUDA kernels (scatter_mean/add/max — models/cgcnn.py:13,
models/megnet.py:86,130-132,342-348). Here they are expressed as XLA segment
ops over static-shape padded buffers; every function takes an explicit mask
so padding is a provable no-op. Accumulation is fp32.

A Pallas TPU kernel path for the hot gather→reduce pattern lives in
ops/pallas_segment.py; these XLA versions are the reference semantics it is
validated against (and the fallback on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked(values: jax.Array, mask: jax.Array | None) -> jax.Array:
    if mask is None:
        return values
    m = mask.astype(values.dtype)
    return values * m.reshape(m.shape + (1,) * (values.ndim - m.ndim))


def segment_sum(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Sum of `values` rows per segment; masked rows contribute zero.

    bf16 inputs accumulate in f32 (a bf16 accumulator loses low bits after
    ~256 addends) and cast back, so mixed-precision nets keep exact-degree
    aggregation semantics."""
    v = _masked(values, mask)
    if v.dtype == jnp.bfloat16:
        return jax.ops.segment_sum(
            v.astype(jnp.float32), segment_ids, num_segments=num_segments
        ).astype(jnp.bfloat16)
    return jax.ops.segment_sum(v, segment_ids, num_segments=num_segments)


def segment_count(
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Number of (unmasked) rows per segment."""
    ones = jnp.ones(segment_ids.shape, dtype)
    if mask is not None:
        ones = ones * mask.astype(dtype)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Mean per segment over true (unmasked) counts; empty segments → 0.

    Matches torch_scatter.scatter_mean semantics (empty segment yields 0).
    """
    total = segment_sum(values, segment_ids, num_segments, mask)
    count = segment_count(segment_ids, num_segments, mask, jnp.float32)
    count = count.reshape(count.shape + (1,) * (total.ndim - count.ndim))
    # Divide in f32 (bf16 can't represent counts > 256 exactly), cast back.
    out = total.astype(jnp.float32) / jnp.maximum(count, 1.0)
    return out.astype(total.dtype)


def segment_max(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Max per segment; masked rows excluded; empty segments → 0.

    torch_scatter.scatter_max fills empty segments with 0 (its init value
    when out is zero-initialized); we replicate that by clamping -inf → 0.
    """
    if mask is not None:
        neg = jnp.asarray(-jnp.inf, values.dtype)
        m = mask.astype(bool).reshape(
            mask.shape + (1,) * (values.ndim - mask.ndim)
        )
        values = jnp.where(m, values, neg)
    out = jax.ops.segment_max(values, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_softmax(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Numerically stable softmax within each segment (for Set2Set attention).

    Masked rows get probability 0; an all-masked segment yields zeros.
    """
    vmax = segment_max(values, segment_ids, num_segments, mask)
    shifted = values - vmax[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        e = e * mask.astype(e.dtype).reshape(
            mask.shape + (1,) * (e.ndim - mask.ndim)
        )
    denom = segment_sum(e, segment_ids, num_segments)
    return e / jnp.maximum(denom[segment_ids], 1e-16)


def gather(values: jax.Array, index: jax.Array) -> jax.Array:
    """Row gather values[index] — the x_j / x_i lookup of message passing."""
    return jnp.take(values, index, axis=0)
