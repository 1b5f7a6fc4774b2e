"""Core NN layers (flax.linen) with reference-parity numerics.

The reference leans on torch.nn primitives (Linear, BatchNorm1d, GRU, LSTM —
e.g. models/cgcnn.py:4, models/mpnn.py:4). These are their JAX twins with:

  * torch-style initialization (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    Linear/GRU/LSTM) so training trajectories are statistically comparable,
  * pad-mask-aware BatchNorm — statistics over *true* rows only, a
    correctness requirement unique to the static-shape padded batch layout,
  * torch BatchNorm1d running-stat semantics: biased variance for
    normalization, unbiased for the running update, momentum 0.1,
    track_running_stats toggle (models/cgcnn.py:84-87).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def _allreduce_sum(x, axis_name: str):
    """All-reduce-sum as reduce-scatter + all-gather — the ring-ep
    gradient-convention-preserving form.

    A plain lax.psum here would give the mathematically correct VJP for the
    stats coupling in isolation (verified empirically) — but the manual
    ring-ep training body (parallel/spmd.py) runs on the convention that
    EVERY local cotangent path carries a uniform x-ep factor (the transpose
    of ring.py's all_gather-after-psum_scatter halo exchange), divided out
    once at gscale. Plain psum's transpose carries x1, so BN stat-coupling
    gradients would come out ep-times too small after that division. Using
    the same psum_scatter/all_gather pair as the halo exchange makes the
    stat path's transpose carry the identical x-ep factor — gradient-exact
    under the body's convention (tests/test_ring_ep.py::
    test_ring_ep_megnet_batchnorm_full_batch_stats)."""
    ep = jax.lax.axis_size(axis_name)
    n = x.shape[0]
    npad = ((n + ep - 1) // ep) * ep
    if npad != n:
        x = jnp.pad(x, (0, npad - n))
    red = jax.lax.psum_scatter(x, axis_name, scatter_dimension=0, tiled=True)
    out = jax.lax.all_gather(red, axis_name, axis=0, tiled=True)
    return out[:n]


def torch_linear_init(fan_in: int):
    """U(-k, k), k = 1/sqrt(fan_in) — torch.nn.Linear's default reset."""
    bound = 1.0 / (fan_in ** 0.5) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def shifted_softplus(x):
    """softplus(x) - log(2) — PyG SchNet's ShiftedSoftplus."""
    return jax.nn.softplus(x) - 0.6931471805599453


# Activation registry resolving the reference's `act` strings, which are
# looked up on torch.nn.functional (models/cgcnn.py:127 getattr(F, act)).
ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softplus": jax.nn.softplus,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "celu": jax.nn.celu,
    "selu": jax.nn.selu,
    "hardtanh": jax.nn.hard_tanh,
    "relu6": lambda x: jnp.minimum(jax.nn.relu(x), 6.0),
    "shifted_softplus": shifted_softplus,
}


def get_activation(name: str) -> Callable:
    if name not in ACTIVATIONS:
        raise ValueError(f"Unknown activation '{name}'")
    return ACTIVATIONS[name]


class Linear(nn.Module):
    """Dense layer with torch.nn.Linear initialization.

    Mixed precision: parameters are stored f32 (master weights) and cast to
    the activation dtype at use — under bf16 activations the matmul runs
    bf16×bf16 on the MXU with f32 accumulation (preferred_element_type),
    the TPU mixed-precision recipe. XLA folds the casts into the matmul.
    """

    features: int
    use_bias: bool = True
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kinit = self.kernel_init or torch_linear_init(fan_in)
        binit = self.bias_init or torch_linear_init(fan_in)
        kernel = self.param("kernel", kinit, (fan_in, self.features))
        y = jnp.dot(
            x, kernel.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        if self.use_bias:
            y = y + self.param("bias", binit, (self.features,)).astype(x.dtype)
        return y


def xavier_uniform():
    return nn.initializers.glorot_uniform()


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d with torch semantics over masked (padded) rows.

    * training: normalize with biased batch stats over rows where mask=1;
      update running stats (unbiased var) when track_stats.
    * eval: running stats if track_stats else batch stats (torch's
      track_running_stats=False behavior).
    * axis_name: psum the stat sums over that mesh axis — used for
      edge-feature BN under manual ring-ep (parallel/spmd.py), where each
      device holds 1/ep of the edge rows but training semantics must match
      full-batch statistics (reference DDP trains BN on each rank's FULL
      edge set, training/training.py:264-266). Only legal inside a
      shard_map binding the axis; model.init runs outside one, hence the
      is_initializing() guard.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    track_stats: bool = True
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )

        # Statistics always in f32 (torch autocast runs BN in f32 too) —
        # under bf16 activations the normalization stays well-conditioned.
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        use_batch_stats = (not use_running_average) or (not self.track_stats)
        if use_batch_stats:
            ax = (self.axis_name
                  if self.axis_name is not None and not self.is_initializing()
                  else None)
            if mask is None:
                m = jnp.ones((x.shape[0], 1), jnp.float32)
            else:
                m = mask.astype(jnp.float32)[:, None]
            count = jnp.sum(m)
            s1 = jnp.sum(x * m, axis=0)
            if ax is not None:  # cross-shard (ring-ep) statistics
                count = jax.lax.psum(count, ax)  # mask: no gradient
                s1 = _allreduce_sum(s1, ax)
            count = jnp.maximum(count, 1.0)
            mean = s1 / count
            s2 = jnp.sum(((x - mean) ** 2) * m, axis=0)
            if ax is not None:
                s2 = _allreduce_sum(s2, ax)
            var = s2 / count
            if self.track_stats and not use_running_average and not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                mom = self.momentum
                ra_mean.value = (1 - mom) * ra_mean.value + mom * mean
                ra_var.value = (1 - mom) * ra_var.value + mom * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon)
        return ((x - mean) * inv * scale + bias).astype(in_dtype)


class GRUCell(nn.Module):
    """Single-step GRU with torch.nn.GRU gate math and parameter layout.

    Used by the MPNN model's per-layer recurrence (models/mpnn.py:90,160),
    which runs torch GRU on sequences of length one — i.e. a cell.
    """

    hidden: int

    @nn.compact
    def __call__(self, x, h):
        H = self.hidden
        init = torch_linear_init(H)  # torch GRU: U(-1/sqrt(H), 1/sqrt(H)) everywhere
        dt = x.dtype
        w_ih = self.param("w_ih", init, (x.shape[-1], 3 * H)).astype(dt)
        w_hh = self.param("w_hh", init, (H, 3 * H)).astype(dt)
        b_ih = self.param("b_ih", init, (3 * H,)).astype(dt)
        b_hh = self.param("b_hh", init, (3 * H,)).astype(dt)
        gi = (jnp.dot(x, w_ih, preferred_element_type=jnp.float32).astype(dt)
              + b_ih)
        gh = (jnp.dot(h.astype(dt), w_hh,
                      preferred_element_type=jnp.float32).astype(dt) + b_hh)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class LSTMCell(nn.Module):
    """Single-step LSTM with torch.nn.LSTM gate math (for Set2Set pooling)."""

    hidden: int

    @nn.compact
    def __call__(self, x, h, c):
        H = self.hidden
        init = torch_linear_init(H)
        dt = x.dtype
        w_ih = self.param("w_ih", init, (x.shape[-1], 4 * H)).astype(dt)
        w_hh = self.param("w_hh", init, (H, 4 * H)).astype(dt)
        b_ih = self.param("b_ih", init, (4 * H,)).astype(dt)
        b_hh = self.param("b_hh", init, (4 * H,)).astype(dt)
        g = (
            jnp.dot(x, w_ih, preferred_element_type=jnp.float32).astype(dt)
            + b_ih
            + jnp.dot(h.astype(dt), w_hh,
                      preferred_element_type=jnp.float32).astype(dt)
            + b_hh
        )
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c_new = f * c + i * jnp.tanh(gg)
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new


class MLP(nn.Module):
    """Stack of Linear(+activation) layers; activation also after the last
    layer when `act_last` (the reference's embed MLPs end in ReLU,
    models/megnet.py:222-230)."""

    features: tuple[int, ...]
    act: str = "relu"
    act_last: bool = True

    @nn.compact
    def __call__(self, x):
        fn = get_activation(self.act)
        for i, f in enumerate(self.features):
            x = Linear(f, name=f"lin{i}")(x)
            if i < len(self.features) - 1 or self.act_last:
                x = fn(x)
        return x
