"""Jitted train/eval steps and the epoch driver.

Reference counterparts: train() (training/training.py:34-54), evaluate()
(:58-92), trainer() (:96-207). TPU-native differences:

  * one compiled train-step program per (model, spec): batch assembly,
    Gaussian edge expansion, forward, loss, backward and optimizer update
    all fuse into a single XLA executable — the host only ships (B,) graph
    ids per step,
  * losses are pad-mask-aware; the per-epoch error is the exact
    sample-weighted mean the reference computes (loss × batch_count),
  * scalar epoch accumulators stay on device; one host sync per epoch.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from matdeeplearn_tpu.data.batching import (
    BatchSpec,
    DeviceDataset,
    assemble_batch,
    batch_iterator,
)
from matdeeplearn_tpu.training.optimizers import (
    get_learning_rate,
    set_learning_rate,
)

# --------------------------------------------------------------------- losses
# Name-compatible with the reference's getattr(torch.nn.functional, loss)
# (training/training.py:43). All reduce as a mean over valid elements.


def _masked_mean(err, gmask):
    if err.ndim == 1:
        total = jnp.sum(err * gmask)
        denom = jnp.sum(gmask)
    else:
        total = jnp.sum(err * gmask[:, None])
        denom = jnp.sum(gmask) * err.shape[-1]
    return total / jnp.maximum(denom, 1.0)


def l1_loss(pred, y, gmask):
    return _masked_mean(jnp.abs(pred - y), gmask)


def mse_loss(pred, y, gmask):
    return _masked_mean((pred - y) ** 2, gmask)


def smooth_l1_loss(pred, y, gmask, beta: float = 1.0):
    d = jnp.abs(pred - y)
    err = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return _masked_mean(err, gmask)


def huber_loss(pred, y, gmask, delta: float = 1.0):
    d = jnp.abs(pred - y)
    err = jnp.where(d < delta, 0.5 * d * d, delta * (d - 0.5 * delta))
    return _masked_mean(err, gmask)


def binary_cross_entropy(pred, y, gmask):
    p = jnp.clip(pred, 1e-7, 1 - 1e-7)
    return _masked_mean(-(y * jnp.log(p) + (1 - y) * jnp.log1p(-p)), gmask)


def binary_cross_entropy_with_logits(pred, y, gmask):
    err = jnp.maximum(pred, 0) - pred * y + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    return _masked_mean(err, gmask)


LOSSES: dict[str, Callable] = {
    "l1_loss": l1_loss,
    "mse_loss": mse_loss,
    "smooth_l1_loss": smooth_l1_loss,
    "huber_loss": huber_loss,
    "binary_cross_entropy": binary_cross_entropy,
    "binary_cross_entropy_with_logits": binary_cross_entropy_with_logits,
}


def get_loss(name: str) -> Callable:
    if name not in LOSSES:
        raise ValueError(f"Unknown loss '{name}'; have {sorted(LOSSES)}")
    return LOSSES[name]


# ---------------------------------------------------------------- train state


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    @property
    def lr(self) -> float:
        return get_learning_rate(self.opt_state)

    def with_lr(self, lr: float) -> "TrainState":
        return self.replace(opt_state=set_learning_rate(self.opt_state, lr))


def init_state(model, tx, sample_batch, seed: int) -> TrainState:
    """Initialize parameters and optimizer state (jitted init — eager init
    round-trips every op through the TPU tunnel)."""
    variables = jax.jit(partial(model.init, training=False))(
        jax.random.PRNGKey(seed), sample_batch
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


# ----------------------------------------------------------------- step fns


def _train_step_body(model, tx, loss_fn, spec: BatchSpec, state, data, ids, rng,
                     assemble_fn=None):
    batch = (assemble_fn or (lambda d, i: assemble_batch(d, i, spec)))(data, ids)

    def compute(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch,
            training=True,
            mutable=["batch_stats"],
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
    count = jnp.sum(batch.graph_mask)
    new_state = state.replace(
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt,
        step=state.step + 1,
    )
    return new_state, loss, count


def make_train_step(model, tx, loss_name: str, spec: BatchSpec, assemble_fn=None):
    loss_fn = get_loss(loss_name)

    @jax.jit
    def train_step(state: TrainState, data: DeviceDataset, ids, rng):
        return _train_step_body(model, tx, loss_fn, spec, state, data, ids, rng,
                                assemble_fn)

    return train_step


def scan_train_epoch_fn(step_body):
    """Build a whole-epoch program from a step body: lax.scan over steps,
    one XLA dispatch per epoch — amortizes host→device launch latency
    (critical behind the axon tunnel, and good practice on real hardware).

    step_body(state, data, ids_row, rng) -> (state, loss, count)
    """

    @jax.jit
    def epoch_fn(state: TrainState, data: DeviceDataset, ids_matrix, rng):
        def body(carry, ids_row):
            state, rng, loss_sum, count_sum = carry
            rng, sub = jax.random.split(rng)
            state, loss, count = step_body(state, data, ids_row, sub)
            return (state, rng, loss_sum + loss * count, count_sum + count), None

        (state, rng, loss_sum, count_sum), _ = jax.lax.scan(
            body, (state, rng, jnp.zeros(()), jnp.zeros(())), ids_matrix
        )
        return state, loss_sum / jnp.maximum(count_sum, 1.0)

    return epoch_fn


def scan_eval_epoch_fn(eval_body):
    """Whole-split evaluation in one dispatch: scan over batches, stacked
    per-graph outputs in id order.

    eval_body(state, data, ids_row) -> (loss, count, out)
    """

    @jax.jit
    def epoch_fn(state: TrainState, data: DeviceDataset, ids_matrix):
        def body(carry, ids_row):
            loss_sum, count_sum = carry
            loss, count, out = eval_body(state, data, ids_row)
            return (loss_sum + loss * count, count_sum + count), out

        (loss_sum, count_sum), outs = jax.lax.scan(
            body, (jnp.zeros(()), jnp.zeros(())), ids_matrix
        )
        return loss_sum / jnp.maximum(count_sum, 1.0), outs

    return epoch_fn


def _eval_step_body(model, loss_fn, spec: BatchSpec, state, data, ids,
                    assemble_fn=None):
    batch = (assemble_fn or (lambda d, i: assemble_batch(d, i, spec)))(data, ids)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch,
        training=False,
    )
    y = batch.y if out.ndim > 1 else batch.y[:, 0]
    loss = loss_fn(out, y, batch.graph_mask)
    return loss, jnp.sum(batch.graph_mask), out


def make_train_epoch_fn(model, tx, loss_name: str, spec: BatchSpec, assemble_fn=None):
    loss_fn = get_loss(loss_name)
    return scan_train_epoch_fn(
        partial(_train_step_body, model, tx, loss_fn, spec, assemble_fn=assemble_fn)
    )


def make_eval_epoch_fn(model, loss_name: str, spec: BatchSpec, assemble_fn=None):
    loss_fn = get_loss(loss_name)
    return scan_eval_epoch_fn(
        partial(_eval_step_body, model, loss_fn, spec, assemble_fn=assemble_fn)
    )


def epoch_id_matrix(indices, batch_size: int, shuffle: bool, seed) -> np.ndarray:
    """(S, B) int32 dataset-id matrix for one epoch; -1 pads the tail."""
    indices = np.asarray(indices)
    n = len(indices)
    order = indices.copy()
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    steps = max(1, -(-n // batch_size))
    padded = np.full(steps * batch_size, -1, dtype=np.int64)
    padded[:n] = order
    return padded.reshape(steps, batch_size).astype(np.int32)


def make_eval_step(model, loss_name: str, spec: BatchSpec, assemble_fn=None):
    loss_fn = get_loss(loss_name)

    @jax.jit
    def eval_step(state: TrainState, data: DeviceDataset, ids):
        batch = (assemble_fn or (lambda d, i: assemble_batch(d, i, spec)))(data, ids)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            training=False,
        )
        y = batch.y if out.ndim > 1 else batch.y[:, 0]
        loss = loss_fn(out, y, batch.graph_mask)
        count = jnp.sum(batch.graph_mask)
        return loss, count, out

    return eval_step


# ------------------------------------------------------------- epoch drivers


def train_epoch_scan(epoch_fn, state, data, indices, batch_size, rng_key,
                     shuffle_seed, id_matrix_fn=None):
    """One epoch through the scanned whole-epoch program (one dispatch)."""
    ids = (id_matrix_fn or partial(epoch_id_matrix, batch_size=batch_size))(
        indices, shuffle=True, seed=shuffle_seed
    )
    rng_key, sub = jax.random.split(rng_key)
    state, loss = epoch_fn(state, data, jnp.asarray(ids), sub)
    return state, float(loss), rng_key


def evaluate_scan(eval_epoch_fn, state, data, indices, batch_size,
                  out: bool = False, id_matrix_fn=None):
    """Mean loss (and optionally predictions/targets in `indices` order)
    via the scanned eval program."""
    ids = (id_matrix_fn or partial(epoch_id_matrix, batch_size=batch_size))(
        indices, shuffle=False, seed=None
    )
    loss, outs = eval_epoch_fn(state, data, jnp.asarray(ids))
    if not out:
        return float(loss)
    outs = np.asarray(outs)
    outs = outs.reshape((-1,) + outs.shape[2:])
    # Map flat batch-slot outputs back to `indices` order (the default id
    # matrix is sequential so this is the identity; packed matrices are not).
    flat_ids = np.asarray(ids).reshape(-1)
    sel = flat_ids >= 0
    fids, fouts = flat_ids[sel], outs[sel]
    order = np.argsort(fids)
    take = order[np.searchsorted(fids[order], np.asarray(indices))]
    outs = fouts[take]
    targs = np.asarray(data.y)[np.asarray(indices)]
    if outs.ndim == 1 and targs.ndim == 2 and targs.shape[1] == 1:
        targs = targs[:, 0]
    return float(loss), outs, targs


def train_epoch(train_step, state, data, indices, batch_size, rng_key, shuffle_seed):
    """One pass over `indices`; returns sample-weighted mean loss
    (reference train(), training/training.py:34-54)."""
    loss_sum = jnp.zeros(())
    count_sum = jnp.zeros(())
    n = len(indices)
    indices = np.asarray(indices)
    for step, local_ids in enumerate(
        batch_iterator(n, batch_size, shuffle=True, seed=shuffle_seed)
    ):
        ids = np.where(local_ids >= 0, indices[np.clip(local_ids, 0, n - 1)], -1)
        rng_key, sub = jax.random.split(rng_key)
        state, loss, count = train_step(
            state, data, jnp.asarray(ids, jnp.int32), sub
        )
        loss_sum = loss_sum + loss * count
        count_sum = count_sum + count
    return state, float(loss_sum / jnp.maximum(count_sum, 1.0)), rng_key


def evaluate(eval_step, state, data, indices, batch_size, out: bool = False):
    """Mean loss over `indices`; optionally per-graph predictions/targets in
    dataset order (reference evaluate(), training/training.py:58-92)."""
    loss_sum = jnp.zeros(())
    count_sum = jnp.zeros(())
    preds, targs = [], []
    n = len(indices)
    indices = np.asarray(indices)
    for local_ids in batch_iterator(n, batch_size, shuffle=False, seed=None):
        ids = np.where(local_ids >= 0, indices[np.clip(local_ids, 0, n - 1)], -1)
        loss, count, pred = eval_step(state, data, jnp.asarray(ids, jnp.int32))
        loss_sum = loss_sum + loss * count
        count_sum = count_sum + count
        if out:
            valid = local_ids >= 0
            p = np.asarray(pred)
            preds.append(p[valid])
            yv = np.asarray(data.y[jnp.asarray(np.where(valid, ids, 0))])
            targs.append(yv[valid])
    loss = float(loss_sum / jnp.maximum(count_sum, 1.0))
    if not out:
        return loss
    return loss, np.concatenate(preds), np.concatenate(targs)


def trainer(
    *,
    train_epoch_fn,
    eval_epoch_fn,
    state: TrainState,
    scheduler,
    data: DeviceDataset,
    train_idx,
    val_idx,
    batch_size: int,
    epochs: int,
    verbosity: int,
    rng_key,
    checkpoint_fn=None,
    report_fn=None,
):
    """Epoch loop with best-val tracking and plateau scheduling on the
    *train* error (reference trainer(), training/training.py:96-207).
    Each epoch is one scanned XLA dispatch."""
    best_val_error = float("inf")
    best_state = state
    val_error = float("nan")
    t0 = time.time()
    for epoch in range(1, epochs + 1):
        lr = scheduler.lr
        state, train_error, rng_key = train_epoch_scan(
            train_epoch_fn, state, data, train_idx, batch_size, rng_key,
            shuffle_seed=epoch,
        )
        if len(val_idx) > 0:
            val_error = evaluate_scan(eval_epoch_fn, state, data, val_idx, batch_size)
            # NaN/inf never improves — a diverged model must not become the
            # best checkpoint (NaN < best is False; reference training.py:145
            # has the same net effect, its NaN check being always-False).
            if val_error < best_val_error:
                best_val_error = val_error
                best_state = state
                if checkpoint_fn is not None:
                    checkpoint_fn(state, scheduler)
        else:
            best_state = state
            if checkpoint_fn is not None:
                checkpoint_fn(state, scheduler)

        state = state.with_lr(scheduler.step(train_error))

        epoch_time = time.time() - t0
        t0 = time.time()
        if report_fn is not None:
            report_fn(epoch=epoch, state=state, scheduler=scheduler,
                      train_error=train_error, val_error=val_error)
        if verbosity and epoch % verbosity == 0:
            print(
                "Epoch: {:04d}, Learning Rate: {:.6f}, Training Error: {:.5f},"
                " Val Error: {:.5f}, Time per epoch (s): {:.5f}".format(
                    epoch, lr, train_error, val_error, epoch_time
                )
            )
    return best_state, state
