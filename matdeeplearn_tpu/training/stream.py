"""Host-fed training loop for disk-streaming datasets.

Companion of data/streaming.py: the dataset never enters HBM; each step
receives one host-assembled GraphBatch pytree. Steps are jitted with
donated state so parameters/optimizer never round-trip.

Prefetch pipeline (r4, VERDICT r3 missing #3): relying on implicit async
dispatch left ~210 ms/step of UNHIDDEN host assembly + H2D at the 46k
corpus (BULK.md r3) — the main thread paid every jnp.asarray transfer
before it could dispatch the step. Batches are now assembled AND
device_put in a background thread through a bounded queue
(`_prefetch_batches`, depth 2): while the device runs step k, the worker
builds and ships batch k+1, so steady-state step time approaches
max(device, assembly, H2D) instead of their sum.

Semantics mirror the fused in-HBM trainer (training/fused.py and the
reference trainer(), training/training.py:96-207): sample-weighted epoch
error, best-val parameter tracking on device, ReduceLROnPlateau stepped
on the *train* error, improvement-gated checkpoints.
"""

from __future__ import annotations

import queue
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from matdeeplearn_tpu.data.batching import batch_iterator
from matdeeplearn_tpu.training import train as T
from matdeeplearn_tpu.training.optimizers import (
    get_learning_rate,
    set_learning_rate,
)

_SENTINEL = object()


def _prefetch_batches(id_rows, assemble_fn, depth: int = 2):
    """Yield (ids, batch) with assembly + device transfer running in a
    background thread, `depth` batches ahead. Exceptions in the worker
    re-raise at the consumer."""
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    err: list[BaseException] = []

    def worker():
        try:
            for ids in id_rows:
                q.put((ids, assemble_fn(ids)))
        except BaseException as e:  # propagate to the consuming thread
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    t.join()
    if err:
        raise err[0]


def make_batch_train_step(model, tx, loss_name: str):
    """Jitted step over a GraphBatch (or compact WireBatch) input — a
    WireBatch expands on device inside the jit, so the f16/u16 H2D
    payload inflates for free (data/streaming.py:expand_wire)."""
    from matdeeplearn_tpu.data.streaming import WireBatch, expand_wire

    loss_fn = T.get_loss(loss_name)

    @jax.jit
    def step(state: T.TrainState, batch, rng):
        if isinstance(batch, WireBatch):
            batch = expand_wire(batch)

        def compute(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, training=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            y = batch.y if out.ndim > 1 else batch.y[:, 0]
            loss = loss_fn(out, y, batch.graph_mask)
            return loss, mut.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, loss, jnp.sum(batch.graph_mask)

    return step


def make_batch_eval_step(model, loss_name: str):
    from matdeeplearn_tpu.data.streaming import WireBatch, expand_wire

    loss_fn = T.get_loss(loss_name)

    @jax.jit
    def step(state: T.TrainState, batch):
        if isinstance(batch, WireBatch):
            batch = expand_wire(batch)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, training=False,
        )
        y = batch.y if out.ndim > 1 else batch.y[:, 0]
        return loss_fn(out, y, batch.graph_mask), jnp.sum(batch.graph_mask), out

    return step


def _epoch_ids(indices: np.ndarray, batch_size: int, shuffle: bool, seed):
    n = len(indices)
    indices = np.asarray(indices)
    for local in batch_iterator(n, batch_size, shuffle=shuffle, seed=seed):
        yield np.where(local >= 0, indices[np.clip(local, 0, n - 1)], -1)


def _ordered_batches(order: np.ndarray, batch_size: int):
    n = len(order)
    steps = max(1, -(-n // batch_size))
    padded = np.full(steps * batch_size, -1, dtype=np.int64)
    padded[:n] = order
    for s in range(steps):
        yield padded[s * batch_size:(s + 1) * batch_size]


def _packed_rows(sds, order, spec, nominal_batch, dp: int):
    """Budget-packed (S, dp·B) id rows over a host order. Sequential fill
    (shuffle=False in the packer) preserves the given order — composing
    with shard-local shuffling keeps LRU locality inside each bin."""
    from matdeeplearn_tpu.data.batching import packed_id_matrix_sharded

    mat = packed_id_matrix_sharded(
        np.asarray(order), sds.node_counts(), sds.edge_counts(), spec,
        nominal_batch, dp, shuffle=False, seed=None,
    )
    yield from mat


def _train_id_batches(sds, indices, batch_size, seed, spec=None,
                      packed: bool = False, dp: int = 1):
    """Shard-aware shuffling when the dataset exposes it (streaming LRU —
    a uniform global shuffle decompresses ~every shard per batch).
    packed=True yields budget-packed rows instead of fixed-size ones."""
    order_fn = getattr(sds, "shard_local_order", None)
    if order_fn is not None:
        order = order_fn(indices, seed)
    else:
        order = np.asarray(indices).copy()
        np.random.default_rng(seed).shuffle(order)
    if packed:
        return _packed_rows(sds, order, spec, batch_size // max(dp, 1), dp)
    return _ordered_batches(order, batch_size)


def _assembler(sds, spec, wire: bool):
    if wire and hasattr(sds, "assemble_wire"):
        return lambda i: sds.assemble_wire(i, spec)
    return lambda i: sds.assemble(i, spec)


def stream_train_epoch(train_step, sds, spec, state, indices, batch_size,
                       rng_key, shuffle_seed, packed: bool = False,
                       dp: int = 1, wire: bool = True):
    loss_sum, count_sum = 0.0, 0.0
    pending = []  # device scalars; resolved once at epoch end
    rows = _train_id_batches(sds, indices, batch_size, shuffle_seed,
                             spec=spec, packed=packed, dp=dp)
    for ids, batch in _prefetch_batches(rows, _assembler(sds, spec, wire)):
        rng_key, sub = jax.random.split(rng_key)
        state, loss, count = train_step(state, batch, sub)
        pending.append((loss, count))
    for loss, count in pending:
        c = float(count)
        loss_sum += float(loss) * c
        count_sum += c
    return state, loss_sum / max(count_sum, 1.0), rng_key, len(pending)


def stream_evaluate(eval_step, sds, spec, state, indices, batch_size,
                    out: bool = False, packed: bool = False, dp: int = 1,
                    wire: bool = True):
    loss_sum, count_sum = 0.0, 0.0
    preds = []
    # Assemble in SORTED id order: shards are contiguous id ranges, so a
    # random subset (e.g. a val split) in its given order faults most of
    # the shard LRU on every batch — measured ~118 s of decompression per
    # eval pass at the 46k corpus (the r4 streaming bench mystery). Sorting
    # makes eval shard-sequential; outputs are remapped to request order by
    # id below, so callers see no difference.
    eval_order = np.sort(np.asarray(indices))
    if packed:
        rows = _packed_rows(sds, eval_order, spec,
                            batch_size // max(dp, 1), dp)
    else:
        rows = _epoch_ids(eval_order, batch_size, shuffle=False, seed=None)
    fids = []
    for ids, batch in _prefetch_batches(rows, _assembler(sds, spec, wire)):
        loss, count, pred = eval_step(state, batch)
        c = float(count)
        loss_sum += float(loss) * c
        count_sum += c
        if out:
            p = np.asarray(pred)
            valid = np.asarray(ids) >= 0
            preds.append(p[: len(valid)][valid])
            fids.append(np.asarray(ids)[valid])
    err = loss_sum / max(count_sum, 1.0)
    if not out:
        return err
    # Map flat batch-slot outputs back to `indices` order (packed bins and
    # dp-interleaved rows are not sequential — same remap as evaluate_scan).
    preds = np.concatenate(preds) if preds else np.zeros(0)
    fids = np.concatenate(fids) if fids else np.zeros(0, np.int64)
    order = np.argsort(fids)
    take = order[np.searchsorted(fids[order], np.asarray(indices))]
    preds = preds[take]
    targs = sds.targets[np.asarray(indices)]
    return err, preds, targs


def stream_trainer(
    *,
    train_step,
    eval_step,
    sds,
    spec,
    state: T.TrainState,
    scheduler,
    train_idx,
    val_idx,
    batch_size: int,
    epochs: int,
    verbosity: int,
    rng_key,
    checkpoint_fn=None,
    shuffle_seed_base: int = 0,
    meter=None,
    packed: bool = False,
    dp: int = 1,
    wire: bool = True,
):
    """Returns (best_state, last_state, scheduler). checkpoint_fn(best_state,
    best_val, scheduler) is called on every best-val improvement. With a
    ThroughputMeter, epochs are accounted individually (epoch 1 = compile
    warmup) and the XLA cost model's per-step FLOPs are recorded once."""
    best_val = float("inf")
    best_params, best_stats = state.params, state.batch_stats
    has_val = len(val_idx) > 0
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        state, train_err, rng_key, n_steps = stream_train_epoch(
            train_step, sds, spec, state, train_idx, batch_size,
            rng_key, shuffle_seed_base + epoch, packed=packed, dp=dp,
            wire=wire,
        )
        val_err = (
            stream_evaluate(eval_step, sds, spec, state, val_idx, batch_size,
                            packed=packed, dp=dp, wire=wire)
            if has_val else float("nan")
        )
        if meter is not None:
            meter.add_chunk(1, n_steps, time.time() - t0,
                            key=("stream", n_steps) if epoch == 1 else None,
                            warmup=None if epoch == 1 else False)
            if meter.flops_per_epoch == 0.0:
                from matdeeplearn_tpu.utils.profiling import xla_cost

                try:
                    ids = next(_epoch_ids(np.asarray(train_idx), batch_size,
                                          False, None))
                    cost = xla_cost(train_step, state,
                                    _assembler(sds, spec, wire)(ids),
                                    jax.random.PRNGKey(0))
                    if cost and cost["flops"] > 0:
                        meter.flops_per_epoch = cost["flops"] * n_steps
                        meter.bytes_per_epoch = cost["bytes"] * n_steps
                except Exception:
                    pass
        metric = val_err if has_val else train_err
        if metric < best_val:
            best_val = metric
            best_params, best_stats = state.params, state.batch_stats
            if checkpoint_fn is not None:
                checkpoint_fn(
                    state.replace(params=best_params, batch_stats=best_stats),
                    best_val, scheduler,
                )
        # Reference quirk preserved: plateau scheduler steps on TRAIN error
        # (training/training.py:193).
        lr = scheduler.step(train_err)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))
        if verbosity and epoch % verbosity == 0:
            print(
                "Epoch: {:04d}, Learning Rate: {:.6f}, Training Error: {:.5f}, "
                "Val Error: {:.5f}, Time per epoch (s): {:.5f}".format(
                    epoch, get_learning_rate(state.opt_state), train_err,
                    val_err, time.time() - t0,
                ),
                flush=True,
            )
    best_state = state.replace(params=best_params, batch_stats=best_stats)
    return best_state, state, scheduler
