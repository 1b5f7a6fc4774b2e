"""SPMD multi-chip training step: jax.shard_map over a (dp, ep) mesh.

Design:

  * dp is a *manual* shard_map axis: each device runs a program that is
    structurally identical to the single-chip step (assemble its own
    static-shape batch on device, forward, backward) — no vmap batching
    dimension, no cross-replica layout inference for XLA to get wrong.
    Measured on the virtual mesh this removed a ~2.5x structural overhead
    the earlier vmap+constraint formulation paid even at dp=1.
  * DDP averaging is three explicit psums over dp: the gradient of the
    global count-weighted mean loss equals psum(grad(local loss·count)) /
    psum(count) (reference DDP semantics: training/training.py:264-266).
  * ep is edge parallelism over the padded edge slots of each replica's
    batch. Default ep_mode="ring": ep joins the manual axes, each member
    owns a contiguous 1/ep slice of the edge slots and runs the
    edge/filter MLPs — where the FLOPs are — on its shard only; the
    boundary-node ("halo") partial sums are combined by reduce-scatter +
    all-gather ring collectives inside every aggregation
    (parallel/ring.py, ops/aggregate.py), proven grad-exact vs the
    single-device step in tests/test_ring_ep.py. ep_mode="gspmd" keeps
    the earlier design: ep stays an *auto* GSPMD axis and per-replica
    edge arrays carry a P('ep') constraint.
  * BatchNorm runs per-replica (reference DDP uses unsynced per-rank BN);
    running stats are psum-averaged across replicas after the step.

Manual ring-ep caveats (setup_run prints these when they apply):
  * edge-feature BatchNorm (MEGNet's edge MLP) psums its batch statistics
    over the ep axis (nn/layers.py:MaskedBatchNorm axis_name, injected by
    setup_run) so training semantics match ep=1 / reference DDP exactly
    even though each device holds 1/ep of the edge rows — verified vs the
    single-device step in tests/test_ring_ep.py (batch_norm=True);
  * the dropout rng is deliberately replicated across the ep group so the
    node paths stay value-identical (the gradient-exactness invariant the
    ×ep gscale correction relies on); the side effect is that edge-path
    dropout masks are correlated across edge shards.

The reference scales lr by world_size (training/training.py:389); callers
apply the same scaling at the job layer.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matdeeplearn_tpu.data.batching import BatchSpec, DeviceDataset, assemble_batch
from matdeeplearn_tpu.training.train import TrainState, get_loss


def _edge_ep_hint(batch, mesh: Mesh):
    """Inside a dp-manual shard_map, hint XLA (GSPMD, ep stays an *auto*
    axis) to split the per-replica edge dimension over ep: the edge/filter
    MLPs — where the FLOPs are — partition, and XLA inserts the psum over
    ICI for the segment reductions at nodes."""
    if int(mesh.shape.get("ep", 1)) == 1:
        return batch

    # Inside the dp-manual region the concrete mesh types don't apply;
    # constraints must be built on the ambient abstract mesh (dp: Manual,
    # ep: Auto).
    am = jax.sharding.get_abstract_mesh()

    def c(x):
        return jax.lax.with_sharding_constraint(x, NamedSharding(am, P("ep")))

    return batch.replace(
        edge_src=c(batch.edge_src),
        edge_dst=c(batch.edge_dst),
        edge_weight=c(batch.edge_weight),
        edge_dist_norm=c(batch.edge_dist_norm),
        edge_mask=c(batch.edge_mask),
    )


def _slice_edge_shard(batch, ep: int):
    """Keep only this device's 1/ep contiguous slice of the padded edge
    slots (the ep partition of the edge dimension). Node/graph arrays stay
    replicated across the ep group; boundary-node partial sums are combined
    by the halo exchange inside ops/aggregate.py (parallel/ring.py)."""
    E = batch.num_edges
    assert E % ep == 0, f"padded edge slots {E} not divisible by ep={ep}"
    el = E // ep
    start = jax.lax.axis_index("ep") * el
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, el, axis=0)
    return batch.replace(
        edge_src=sl(batch.edge_src),
        edge_dst=sl(batch.edge_dst),
        edge_weight=sl(batch.edge_weight),
        edge_dist_norm=sl(batch.edge_dist_norm),
        edge_mask=sl(batch.edge_mask),
    )


def _avg_stats(manual_ep: bool, dp: int, s):
    """Average BatchNorm running stats across dp replicas (reference DDP
    keeps per-rank BN; we take the mean so the saved model is rank-free).

    Under manual ep, per-leaf vma decides the ep handling: node-feature BN
    stats are value-identical across the ep group but vma-tracked as
    ep-varying (pmean drops the axis without changing the value), while
    ep_axis-psum'd edge-BN stats (nn/layers.py) are already ep-invariant
    and must not be reduced over ep again."""
    if manual_ep and "ep" in getattr(jax.typeof(s), "vma", frozenset()):
        s = jax.lax.pmean(s, "ep")
    return jax.lax.psum(s, "dp") / dp


def _spmd_train_body(model, tx, loss_fn, spec, mesh, ids_sharding,
                     assemble_fn=None, ep_mode: str = "ring"):
    """Per-replica step body mapped manually over dp with jax.shard_map.

    Design: the per-device program is *structurally identical* to the
    single-chip step (no vmap batching dim, no cross-replica layout
    inference) plus three explicit psums — gradient/loss/count — so DDP
    averaging is exact: grad of the global count-weighted mean loss equals
    psum(grad(local_sum)) / psum(count). BatchNorm runs per replica
    (reference DDP uses unsynced per-rank BN); running stats are psum-
    averaged across replicas after the step.

    ep_mode:
      * "ring" (default): ep joins the manual axes — each ep member owns a
        1/ep slice of the padded edge slots, runs the edge/filter MLPs on
        its shard, and boundary-node partials ride the reduce-scatter +
        all-gather halo exchange (parallel/ring.py).
      * "gspmd": ep stays an auto GSPMD axis; per-replica edge arrays carry
        a P('ep') constraint and XLA chooses the collectives.
    """
    dp = int(mesh.shape["dp"])
    ep = int(mesh.shape.get("ep", 1))
    manual_ep = ep > 1 and ep_mode == "ring"
    axis_names = {"dp", "ep"} if manual_ep else {"dp"}

    def body(state: TrainState, data: DeviceDataset, ids, rng):
        ids = ids.reshape(dp, -1)
        rngs = jax.random.split(rng, dp)

        def shard_fn(state, data, ids_blk, rng_blk):
            batch = (assemble_fn or (lambda d, i: assemble_batch(d, i, spec)))(
                data, ids_blk[0]
            )
            if manual_ep:
                batch = _slice_edge_shard(batch, ep)
            else:
                batch = _edge_ep_hint(batch, mesh)
            rng_local = rng_blk[0]

            def compute(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch,
                    training=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": rng_local},
                )
                y = batch.y if out.ndim > 1 else batch.y[:, 0]
                cnt = jnp.sum(batch.graph_mask)
                return loss_fn(out, y, batch.graph_mask) * cnt, (
                    cnt, mut.get("batch_stats", {})
                )

            (lsum, (cnt, stats)), g = jax.value_and_grad(
                compute, has_aux=True
            )(state.params)
            if manual_ep:
                # lsum is value-identical across the ep group (node/graph
                # arrays are replicated; the halo exchange restores full
                # aggregates) but vma-tracked as ep-varying — pmean drops
                # the axis without changing the value.
                lsum = jax.lax.pmean(lsum, "ep")
            csum = jnp.maximum(jax.lax.psum(cnt, "dp"), 1.0)
            # params enter replicated (unvarying over dp/ep): shard_map AD
            # psums the cotangent over every varying axis at the broadcast
            # transpose, so `g` IS the global gradient sum over dp. Under
            # manual ep each path additionally carries a uniform ×ep factor:
            # the all_gather∘psum_scatter transpose pair multiplies edge-path
            # cotangents by ep, and the ep members' identical node-path
            # contributions sum to ep× — verified exactly against the
            # single-device gradient in tests/test_ring_ep.py.
            gscale = csum * ep if manual_ep else csum
            grads = jax.tree.map(lambda x: x / gscale, g)
            loss = jax.lax.psum(lsum, "dp") / csum
            new_stats = jax.tree.map(partial(_avg_stats, manual_ep, dp), stats)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(
                lambda p, u: p + u, state.params, updates
            )
            new_state = state.replace(
                params=new_params,
                batch_stats=new_stats if state.batch_stats else state.batch_stats,
                opt_state=new_opt,
                step=state.step + 1,
            )
            return new_state, loss, csum

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P("dp"), P("dp")),
            out_specs=(P(), P(), P()),
            axis_names=axis_names,
        )(state, data, ids, rngs)

    return body


def make_spmd_train_step(model, tx, loss_name: str, spec: BatchSpec, mesh: Mesh,
                         assemble_fn=None, ep_mode: str = "ring"):
    """Multi-chip train step, drop-in for the single-device step: takes a
    flat (dp·B,) id vector (reshaped to one (B,) batch per dp replica)."""
    loss_fn = get_loss(loss_name)
    ids_sharding = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    body = _spmd_train_body(model, tx, loss_fn, spec, mesh, ids_sharding,
                            assemble_fn, ep_mode)
    return jax.jit(body), ids_sharding, rep


def make_spmd_train_epoch_fn(model, tx, loss_name: str, spec: BatchSpec,
                             mesh: Mesh, assemble_fn=None, ep_mode: str = "ring"):
    """Whole-epoch scan over the SPMD step body (one dispatch per epoch)."""
    from matdeeplearn_tpu.training.train import scan_train_epoch_fn

    loss_fn = get_loss(loss_name)
    ids_sharding = NamedSharding(mesh, P("dp"))
    body = _spmd_train_body(model, tx, loss_fn, spec, mesh, ids_sharding,
                            assemble_fn, ep_mode)
    return scan_train_epoch_fn(body)


def _spmd_eval_body(model, loss_fn, spec, mesh, ids_sharding,
                    assemble_fn=None, ep_mode: str = "ring"):
    dp = int(mesh.shape["dp"])
    ep = int(mesh.shape.get("ep", 1))
    manual_ep = ep > 1 and ep_mode == "ring"
    axis_names = {"dp", "ep"} if manual_ep else {"dp"}

    def body(state: TrainState, data: DeviceDataset, ids):
        ids = ids.reshape(dp, -1)

        def shard_fn(state, data, ids_blk):
            batch = (assemble_fn or (lambda d, i: assemble_batch(d, i, spec)))(
                data, ids_blk[0]
            )
            if manual_ep:
                batch = _slice_edge_shard(batch, ep)
            else:
                batch = _edge_ep_hint(batch, mesh)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch,
                training=False,
            )
            y = batch.y if out.ndim > 1 else batch.y[:, 0]
            cnt = jnp.sum(batch.graph_mask)
            lsum = loss_fn(out, y, batch.graph_mask) * cnt
            if manual_ep:
                # Value-identical across ep; pmean just drops the vma axis.
                lsum = jax.lax.pmean(lsum, "ep")
                out = jax.lax.pmean(out, "ep")
            csum = jnp.maximum(jax.lax.psum(cnt, "dp"), 1.0)
            return jax.lax.psum(lsum, "dp") / csum, csum, out

        # outs concatenate over dp (out_spec P("dp")): flat row-major over
        # (dp, B) = the original id order.
        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P("dp")),
            out_specs=(P(), P(), P("dp")),
            axis_names=axis_names,
        )(state, data, ids)

    return body


def make_spmd_eval_step(model, loss_name: str, spec: BatchSpec, mesh: Mesh,
                        assemble_fn=None, ep_mode: str = "ring"):
    loss_fn = get_loss(loss_name)
    ids_sharding = NamedSharding(mesh, P("dp"))
    return jax.jit(_spmd_eval_body(model, loss_fn, spec, mesh, ids_sharding,
                                   assemble_fn, ep_mode))


def make_spmd_eval_epoch_fn(model, loss_name: str, spec: BatchSpec, mesh: Mesh,
                            assemble_fn=None, ep_mode: str = "ring"):
    from matdeeplearn_tpu.training.train import scan_eval_epoch_fn

    loss_fn = get_loss(loss_name)
    ids_sharding = NamedSharding(mesh, P("dp"))
    return scan_eval_epoch_fn(
        _spmd_eval_body(model, loss_fn, spec, mesh, ids_sharding, assemble_fn,
                        ep_mode)
    )


def make_spmd_batch_train_step(model, tx, loss_name: str, mesh: Mesh,
                               ep_mode: str = "ring"):
    """SPMD step over a host-fed batch pytree with a leading (dp, ...) axis
    (streaming datasets: the dataset never enters HBM, so each step receives
    dp stacked per-replica batches sharded over the dp axis). Semantics match
    _spmd_train_body: per-replica BN, count-weighted global mean loss ⇒
    jax.grad gives the DDP-averaged gradient; under ep>1 with
    ep_mode="ring" each ep member takes a 1/ep edge-slot slice of its
    replica's batch and aggregations halo-exchange (parallel/ring.py)."""
    loss_fn = get_loss(loss_name)
    dp = int(mesh.shape["dp"])
    ep = int(mesh.shape.get("ep", 1))
    manual_ep = ep > 1 and ep_mode == "ring"
    axis_names = {"dp", "ep"} if manual_ep else {"dp"}

    def shard_fn(state, batch, rng_blk):
        b = jax.tree.map(lambda x: x[0], batch)
        b = _maybe_expand_wire(b)
        if manual_ep:
            b = _slice_edge_shard(b, ep)
        rng_local = rng_blk[0]

        def compute(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                b,
                training=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng_local},
            )
            y = b.y if out.ndim > 1 else b.y[:, 0]
            cnt = jnp.sum(b.graph_mask)
            return loss_fn(out, y, b.graph_mask) * cnt, (
                cnt, mut.get("batch_stats", {})
            )

        (lsum, (cnt, stats)), g = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        if manual_ep:
            lsum = jax.lax.pmean(lsum, "ep")
        csum = jnp.maximum(jax.lax.psum(cnt, "dp"), 1.0)
        # shard_map AD psums the cotangent of the replicated params at the
        # broadcast transpose: `g` is already the global sum (uniform ×ep
        # under manual ep — see _spmd_train_body).
        gscale = csum * ep if manual_ep else csum
        grads = jax.tree.map(lambda x: x / gscale, g)
        loss = jax.lax.psum(lsum, "dp") / csum
        new_stats = jax.tree.map(partial(_avg_stats, manual_ep, dp), stats)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats if state.batch_stats else state.batch_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, loss, csum

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P(), P(), P()),
        axis_names=axis_names,
    )

    @jax.jit
    def step(state: TrainState, batch, rng):
        return mapped(state, batch, jax.random.split(rng, dp))

    return step


def make_spmd_batch_eval_step(model, loss_name: str, mesh: Mesh,
                              ep_mode: str = "ring"):
    """Eval analog of make_spmd_batch_train_step; outputs are flattened
    row-major over (dp, B) = original global id order."""
    loss_fn = get_loss(loss_name)
    ep = int(mesh.shape.get("ep", 1))
    manual_ep = ep > 1 and ep_mode == "ring"
    axis_names = {"dp", "ep"} if manual_ep else {"dp"}

    def shard_fn(state, batch):
        b = jax.tree.map(lambda x: x[0], batch)
        b = _maybe_expand_wire(b)
        if manual_ep:
            b = _slice_edge_shard(b, ep)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            b,
            training=False,
        )
        y = b.y if out.ndim > 1 else b.y[:, 0]
        cnt = jnp.sum(b.graph_mask)
        lsum = loss_fn(out, y, b.graph_mask) * cnt
        if manual_ep:
            lsum = jax.lax.pmean(lsum, "ep")
            out = jax.lax.pmean(out, "ep")
        csum = jnp.maximum(jax.lax.psum(cnt, "dp"), 1.0)
        return jax.lax.psum(lsum, "dp") / csum, csum, out

    return jax.jit(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=(P(), P(), P("dp")),
        axis_names=axis_names,
    ))


def _maybe_expand_wire(b):
    """Inflate a per-replica WireBatch (compact streaming H2D payload) to a
    GraphBatch inside the shard body — data/streaming.py:expand_wire."""
    from matdeeplearn_tpu.data.streaming import WireBatch, expand_wire

    return expand_wire(b) if isinstance(b, WireBatch) else b


class ShardedStream:
    """Wraps a StreamingGraphDataset so each assemble() returns dp stacked
    per-replica batches placed with a P('dp') sharding — streaming × SPMD.
    Everything else (targets, metadata) delegates to the wrapped dataset."""

    def __init__(self, sds, mesh: Mesh):
        self._sds = sds
        self._mesh = mesh
        self._dp = int(mesh.shape["dp"])
        self._sharding = NamedSharding(mesh, P("dp"))

    def __getattr__(self, name):
        return getattr(self._sds, name)

    def __len__(self):
        return len(self._sds)

    def assemble(self, graph_ids, spec):
        import numpy as np

        ids = np.asarray(graph_ids).reshape(self._dp, -1)
        parts = [self._sds.assemble(row, spec) for row in ids]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *parts)
        return jax.device_put(stacked, self._sharding)

    def assemble_wire(self, graph_ids, spec):
        # dp-stacked compact wire payloads; the SPMD batch steps expand
        # per replica inside the shard body (_maybe_expand_wire).
        import numpy as np

        ids = np.asarray(graph_ids).reshape(self._dp, -1)
        parts = [self._sds.assemble_wire(row, spec) for row in ids]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *parts)
        return jax.device_put(stacked, self._sharding)


def shard_ids(ids, dp: int):
    """Reshape a flat (dp*B,) id vector to (dp, B) for the spmd step."""
    import numpy as np

    ids = np.asarray(ids)
    assert ids.shape[0] % dp == 0
    return ids.reshape(dp, -1)
