"""SPMD multi-chip training step: vmap over replicas + GSPMD sharding.

Design (the "annotate shardings, let XLA insert collectives" recipe):

  * the per-step graph-id matrix has shape (dp, B) and is sharded over the
    mesh's dp axis; each replica assembles its own static-shape batch on
    device (vmapped assemble_batch),
  * edge-indexed arrays inside the batch carry a P('dp', 'ep') sharding
    constraint, so the edge/filter MLPs — where the FLOPs are — split over
    the ep axis while node tensors stay replicated within an ep group; XLA
    partitions the segment reductions and inserts the psum/reduce-scatter
    over ICI,
  * the loss is the count-weighted mean over all replicas, so a single
    jax.grad yields exactly the DDP-averaged gradient (reference DDP
    semantics: training/training.py:264-266) with guaranteed-correct AD —
    no hand-written collective transposes to get wrong,
  * BatchNorm runs per-replica (reference DDP uses unsynced per-rank BN);
    running stats are averaged across replicas after the step.

The reference scales lr by world_size (training/training.py:389); callers
apply the same scaling at the job layer.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matdeeplearn_tpu.data.batching import BatchSpec, DeviceDataset, assemble_batch
from matdeeplearn_tpu.training.train import TrainState, get_loss


def _constrain_batch(batch, mesh: Mesh):
    """Sharding constraints: replica axis over dp; edge arrays also over ep."""

    def c(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    edge = P("dp", "ep")
    rep = P("dp")
    return batch.replace(
        x=c(batch.x, rep),
        edge_src=c(batch.edge_src, edge),
        edge_dst=c(batch.edge_dst, edge),
        edge_weight=c(batch.edge_weight, edge),
        edge_dist_norm=c(batch.edge_dist_norm, edge),
        edge_mask=c(batch.edge_mask, edge),
        node_graph=c(batch.node_graph, rep),
        node_mask=c(batch.node_mask, rep),
        graph_mask=c(batch.graph_mask, rep),
        y=c(batch.y, rep),
        u=c(batch.u, rep),
        n_node=c(batch.n_node, rep),
    )


def _spmd_train_body(model, tx, loss_fn, spec, mesh, ids_sharding):
    dp = mesh.shape["dp"]

    def body(state: TrainState, data: DeviceDataset, ids, rng):
        ids = ids.reshape(dp, -1)
        ids = jax.lax.with_sharding_constraint(ids, ids_sharding)
        batch = jax.vmap(lambda row: assemble_batch(data, row, spec))(ids)
        batch = _constrain_batch(batch, mesh)
        rngs = jax.random.split(rng, dp)

        def compute(params):
            def fwd(b, r):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    b,
                    training=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": r},
                )
                y = b.y if out.ndim > 1 else b.y[:, 0]
                local_loss = loss_fn(out, y, b.graph_mask)
                return local_loss, jnp.sum(b.graph_mask), mut.get("batch_stats", {})

            losses, counts, stats = jax.vmap(fwd)(batch, rngs)
            total = jnp.sum(losses * counts)
            count = jnp.maximum(jnp.sum(counts), 1.0)
            # Per-replica BN stats averaged (reference DDP: unsynced BN,
            # rank-0 stats win; averaging is the deterministic analog).
            new_stats = jax.tree.map(lambda s: jnp.mean(s, axis=0), stats)
            return total / count, (new_stats, count)

        (loss, (new_stats, count)), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats if state.batch_stats else state.batch_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, loss, count

    return body


def make_spmd_train_step(model, tx, loss_name: str, spec: BatchSpec, mesh: Mesh):
    """Multi-chip train step, drop-in for the single-device step: takes a
    flat (dp·B,) id vector (reshaped to one (B,) batch per dp replica)."""
    loss_fn = get_loss(loss_name)
    ids_sharding = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    body = _spmd_train_body(model, tx, loss_fn, spec, mesh, ids_sharding)
    return jax.jit(body), ids_sharding, rep


def make_spmd_train_epoch_fn(model, tx, loss_name: str, spec: BatchSpec, mesh: Mesh):
    """Whole-epoch scan over the SPMD step body (one dispatch per epoch)."""
    from matdeeplearn_tpu.training.train import scan_train_epoch_fn

    loss_fn = get_loss(loss_name)
    ids_sharding = NamedSharding(mesh, P("dp"))
    body = _spmd_train_body(model, tx, loss_fn, spec, mesh, ids_sharding)
    return scan_train_epoch_fn(body)


def _spmd_eval_body(model, loss_fn, spec, mesh, ids_sharding):
    dp = mesh.shape["dp"]

    def body(state: TrainState, data: DeviceDataset, ids):
        ids = ids.reshape(dp, -1)
        ids = jax.lax.with_sharding_constraint(ids, ids_sharding)
        batch = jax.vmap(lambda row: assemble_batch(data, row, spec))(ids)
        batch = _constrain_batch(batch, mesh)

        def fwd(b):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                b,
                training=False,
            )
            y = b.y if out.ndim > 1 else b.y[:, 0]
            return loss_fn(out, y, b.graph_mask), jnp.sum(b.graph_mask), out

        losses, counts, outs = jax.vmap(fwd)(batch)
        total = jnp.sum(losses * counts)
        count = jnp.maximum(jnp.sum(counts), 1.0)
        outs = outs.reshape((-1,) + outs.shape[2:])  # flat, row-major = id order
        return total / count, count, outs

    return body


def make_spmd_eval_step(model, loss_name: str, spec: BatchSpec, mesh: Mesh):
    loss_fn = get_loss(loss_name)
    ids_sharding = NamedSharding(mesh, P("dp"))
    return jax.jit(_spmd_eval_body(model, loss_fn, spec, mesh, ids_sharding))


def make_spmd_eval_epoch_fn(model, loss_name: str, spec: BatchSpec, mesh: Mesh):
    from matdeeplearn_tpu.training.train import scan_eval_epoch_fn

    loss_fn = get_loss(loss_name)
    ids_sharding = NamedSharding(mesh, P("dp"))
    return scan_eval_epoch_fn(_spmd_eval_body(model, loss_fn, spec, mesh, ids_sharding))


def make_spmd_batch_train_step(model, tx, loss_name: str, mesh: Mesh):
    """SPMD step over a host-fed batch pytree with a leading (dp, ...) axis
    (streaming datasets: the dataset never enters HBM, so each step receives
    dp stacked per-replica batches sharded over the dp axis). Semantics match
    _spmd_train_body: per-replica BN, count-weighted global mean loss ⇒
    jax.grad gives the DDP-averaged gradient."""
    loss_fn = get_loss(loss_name)
    dp = mesh.shape["dp"]

    @jax.jit
    def step(state: TrainState, batch, rng):
        rngs = jax.random.split(rng, dp)

        def compute(params):
            def fwd(b, r):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    b,
                    training=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": r},
                )
                y = b.y if out.ndim > 1 else b.y[:, 0]
                return (
                    loss_fn(out, y, b.graph_mask),
                    jnp.sum(b.graph_mask),
                    mut.get("batch_stats", {}),
                )

            losses, counts, stats = jax.vmap(fwd)(batch, rngs)
            total = jnp.sum(losses * counts)
            count = jnp.maximum(jnp.sum(counts), 1.0)
            new_stats = jax.tree.map(lambda s: jnp.mean(s, axis=0), stats)
            return total / count, (new_stats, count)

        (loss, (new_stats, count)), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats if state.batch_stats else state.batch_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, loss, count

    return step


def make_spmd_batch_eval_step(model, loss_name: str, mesh: Mesh):
    """Eval analog of make_spmd_batch_train_step; outputs are flattened
    row-major over (dp, B) = original global id order."""
    loss_fn = get_loss(loss_name)

    @jax.jit
    def step(state: TrainState, batch):
        def fwd(b):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                b,
                training=False,
            )
            y = b.y if out.ndim > 1 else b.y[:, 0]
            return loss_fn(out, y, b.graph_mask), jnp.sum(b.graph_mask), out

        losses, counts, outs = jax.vmap(fwd)(batch)
        total = jnp.sum(losses * counts)
        count = jnp.maximum(jnp.sum(counts), 1.0)
        outs = outs.reshape((-1,) + outs.shape[2:])
        return total / count, count, outs

    return step


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


def shard_ids(ids, dp: int):
    """Reshape a flat (dp*B,) id vector to (dp, B) for the spmd step."""
    import numpy as np

    ids = np.asarray(ids)
    assert ids.shape[0] % dp == 0
    return ids.reshape(dp, -1)
