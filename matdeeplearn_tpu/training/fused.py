"""Fused multi-epoch training: K epochs per XLA dispatch.

Per-epoch host round-trips (read train error → step scheduler → maybe
checkpoint) serialize training on launch latency. Here the entire epoch
loop state machine runs on device:

  * ReduceLROnPlateau as a branchless jnp state machine (exact torch
    semantics — mirrors scheduler.py, verified in tests),
  * the learning rate lives in optax's InjectHyperparamsState, so the
    on-device scheduler updates it without retracing,
  * best-val tracking keeps a device-side copy of the best params/stats
    (selected with jnp.where per leaf on improvement),
  * a chunk of `verbosity` epochs runs as one lax.scan dispatch; the host
    syncs once per chunk to print and checkpoint.

Semantics match the reference trainer (training/training.py:96-207):
scheduler steps on the *train* error after the best-val decision; the best
model is the one with the lowest validation error.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from matdeeplearn_tpu.training.train import TrainState


class PlateauState(NamedTuple):
    lr: jax.Array        # current learning rate
    best: jax.Array      # best metric seen
    num_bad: jax.Array   # epochs without sufficient improvement
    cooldown: jax.Array  # cooldown counter


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(
        lr=jnp.asarray(lr, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad=jnp.zeros((), jnp.int32),
        cooldown=jnp.zeros((), jnp.int32),
    )


def plateau_step(
    state: PlateauState,
    metric: jax.Array,
    *,
    factor: float,
    patience: int,
    threshold: float,
    min_lr: float,
    cooldown: int = 0,
    threshold_mode: str = "rel",
    enabled: bool = True,
) -> PlateauState:
    """One scheduler step (torch ReduceLROnPlateau, mode='min'), branchless."""
    if not enabled:
        return state
    if threshold_mode == "rel":
        is_better = metric < state.best * (1.0 - threshold)
    else:
        is_better = metric < state.best - threshold
    best = jnp.where(is_better, metric, state.best)
    num_bad = jnp.where(is_better, 0, state.num_bad + 1)
    in_cooldown = state.cooldown > 0
    cd = jnp.where(in_cooldown, state.cooldown - 1, 0)
    num_bad = jnp.where(in_cooldown, 0, num_bad)
    reduce_now = num_bad > patience
    lr = jnp.where(reduce_now, jnp.maximum(state.lr * factor, min_lr), state.lr)
    cd = jnp.where(reduce_now, cooldown, cd)
    num_bad = jnp.where(reduce_now, 0, num_bad)
    return PlateauState(lr=lr, best=best, num_bad=num_bad, cooldown=cd)


def _host_plateau(lr, best, num_bad, cooldown_ct, metric, *, factor,
                  patience, threshold, min_lr, cooldown=0,
                  threshold_mode="rel", enabled=True):
    """Host-float twin of plateau_step (torch ReduceLROnPlateau, mode=min)
    for the segmented trainer — eager jnp scalar math would round-trip the
    TPU tunnel per op."""
    if not enabled:
        return lr, best, num_bad, cooldown_ct
    if threshold_mode == "rel":
        is_better = metric < best * (1.0 - threshold)
    else:
        is_better = metric < best - threshold
    best = metric if is_better else best
    num_bad = 0 if is_better else num_bad + 1
    if cooldown_ct > 0:
        cooldown_ct -= 1
        num_bad = 0
    if num_bad > patience:
        lr = max(lr * factor, min_lr)
        cooldown_ct = cooldown
        num_bad = 0
    return lr, best, num_bad, cooldown_ct


def _segmented_trainer(*, train_body, eval_body, state, data, train_idx,
                       val_idx, epochs, verbosity, lr, scheduler_kwargs,
                       scheduler_enabled, rng_key, checkpoint_fn, idm,
                       seg_rows, meter, shuffle_seed_base):
    """Sub-epoch dispatch driver: one epoch = several fixed-shape scan
    dispatches over row segments of the id matrix (pad rows of -1 make the
    last segment shape-stable). Semantics identical to the fused on-device
    trainer — per-step rng splits, count-weighted epoch error, best-val
    params kept on device, plateau scheduler on the train error — only the
    epoch state machine runs on the host. Exists for runtimes that kill
    long single dispatches (MDL_MAX_DISPATCH_S, see fused_trainer)."""
    import time

    @jax.jit
    def seg_train(state, data, ids_matrix, rng, lsum, csum):
        def body(carry, ids_row):
            state, rng, ls, cs = carry
            rng, sub = jax.random.split(rng)
            state, loss, count = train_body(state, data, ids_row, sub)
            return (state, rng, ls + loss * count, cs + count), None

        (state, rng, lsum, csum), _ = jax.lax.scan(
            body, (state, rng, lsum, csum), ids_matrix
        )
        return state, rng, lsum, csum

    @jax.jit
    def seg_eval(state, data, ids_matrix, lsum, csum):
        def body(c, row):
            ls, cs = c
            loss, count, _ = eval_body(state, data, row)
            return (ls + loss * count, cs + count), None

        (lsum, csum), _ = jax.lax.scan(body, (jnp.zeros(()), jnp.zeros(())),
                                       ids_matrix)
        return lsum, csum

    @partial(jax.jit, static_argnums=())
    def select_best(improved, cand_p, cand_s, best_p, best_s):
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(improved, x, y), a, b)
        return sel(cand_p, best_p), sel(cand_s, best_s)

    has_val = len(val_idx) > 0
    val_ids = (idm(val_idx, shuffle=False, seed=None) if has_val else None)
    best_val = float("inf")
    best_params, best_stats = state.params, state.batch_stats
    sched = dict(lr=lr, best=float("inf"), num_bad=0, cooldown_ct=0)
    rng = rng_key
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        ids = idm(train_idx, shuffle=True, seed=shuffle_seed_base + epoch)
        S, B = ids.shape
        nseg = -(-S // seg_rows)
        pad = nseg * seg_rows - S
        if pad:
            ids = np.vstack([ids, np.full((pad, B), -1, ids.dtype)])
        lsum = csum = jnp.zeros(())
        for s in range(nseg):
            seg = jnp.asarray(ids[s * seg_rows:(s + 1) * seg_rows])
            state, rng, lsum, csum = seg_train(state, data, seg, rng,
                                               lsum, csum)
        train_err = float(lsum) / max(float(csum), 1.0)
        if has_val:
            vl, vc = seg_eval(state, data, jnp.asarray(val_ids),
                              jnp.zeros(()), jnp.zeros(()))
            val_err = float(vl) / max(float(vc), 1.0)
            improved = val_err < best_val
        else:
            val_err = float("nan")
            improved = True
        if improved and not np.isnan(val_err):
            best_val = val_err if has_val else best_val
        if improved:
            best_params, best_stats = select_best(
                jnp.asarray(True), state.params, state.batch_stats,
                best_params, best_stats)
        lr_before = sched["lr"]
        sched["lr"], sched["best"], sched["num_bad"], sched["cooldown_ct"] = \
            _host_plateau(sched["lr"], sched["best"], sched["num_bad"],
                          sched["cooldown_ct"], train_err,
                          enabled=scheduler_enabled, **scheduler_kwargs)
        state = state.with_lr(sched["lr"])
        dt = time.time() - t0
        if meter is not None:
            meter.add_chunk(1, S, dt, key=("seg", seg_rows) if epoch == 1
                            else None, warmup=None if epoch == 1 else False)
        if verbosity and epoch % verbosity == 0:
            print(
                "Epoch: {:04d}, Learning Rate: {:.6f}, Training Error: "
                "{:.5f}, Val Error: {:.5f}, Time per epoch (s): {:.5f}"
                .format(epoch, lr_before, train_err, val_err, dt)
            )
        if checkpoint_fn is not None:
            carry = FusedCarry(
                state=state, sched=PlateauState(
                    lr=jnp.asarray(sched["lr"]),
                    best=jnp.asarray(sched["best"]),
                    num_bad=jnp.asarray(sched["num_bad"]),
                    cooldown=jnp.asarray(sched["cooldown_ct"])),
                best_val=jnp.asarray(best_val), best_params=best_params,
                best_stats=best_stats, rng=rng)
            checkpoint_fn(carry)
    best_state = state.replace(params=best_params, batch_stats=best_stats)
    final = PlateauState(lr=jnp.asarray(sched["lr"]),
                         best=jnp.asarray(sched["best"]),
                         num_bad=jnp.asarray(sched["num_bad"]),
                         cooldown=jnp.asarray(sched["cooldown_ct"]))
    return best_state, state, final


class FusedCarry(NamedTuple):
    state: Any            # TrainState
    sched: PlateauState
    best_val: jax.Array
    best_params: Any
    best_stats: Any
    rng: jax.Array


def make_fused_epochs_fn(
    train_body,
    eval_body,
    *,
    has_val: bool,
    scheduler_kwargs: dict,
    scheduler_enabled: bool = True,
):
    """Build fn(carry, train_ids (K,S,B), val_ids (Sv,B)) → (carry, metrics).

    train_body(state, data, ids_row, rng) -> (state, loss, count)
    eval_body(state, data, ids_row) -> (loss, count, out)
    metrics: dict of (K,) arrays {train_error, val_error, lr}.
    """
    pstep = partial(plateau_step, enabled=scheduler_enabled, **scheduler_kwargs)

    @jax.jit
    def fused(carry: FusedCarry, data, train_ids, val_ids):
        def epoch_body(c: FusedCarry, ids_epoch):
            lr_before = c.sched.lr

            def step(sc, ids_row):
                state, rng, lsum, csum = sc
                rng, sub = jax.random.split(rng)
                state, loss, count = train_body(state, data, ids_row, sub)
                return (state, rng, lsum + loss * count, csum + count), None

            (state, rng, lsum, csum), _ = jax.lax.scan(
                step, (c.state, c.rng, jnp.zeros(()), jnp.zeros(())), ids_epoch
            )
            train_error = lsum / jnp.maximum(csum, 1.0)

            if has_val:
                def vstep(vc, ids_row):
                    vlsum, vcsum = vc
                    loss, count, _ = eval_body(state, data, ids_row)
                    return (vlsum + loss * count, vcsum + count), None

                (vlsum, vcsum), _ = jax.lax.scan(
                    vstep, (jnp.zeros(()), jnp.zeros(())), val_ids
                )
                val_error = vlsum / jnp.maximum(vcsum, 1.0)
                # NaN never improves: a diverged model must not become the
                # best checkpoint (reference training.py:145 — its NaN check
                # is always-False, so NaN never replaces the best model there
                # either; `NaN < best` is False under IEEE).
                improved = val_error < c.best_val
            else:
                val_error = jnp.asarray(jnp.nan)
                improved = jnp.asarray(True)

            best_val = jnp.where(
                improved & ~jnp.isnan(val_error), val_error, c.best_val
            )
            sel = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(improved, x, y), a, b
            )
            best_params = sel(state.params, c.best_params)
            best_stats = sel(state.batch_stats, c.best_stats)

            # Scheduler on the *train* error, after the best-val decision
            # (reference training.py:193).
            sched = pstep(c.sched, train_error)
            opt_state = state.opt_state
            hp = dict(opt_state.hyperparams)
            hp["learning_rate"] = sched.lr
            state = state.replace(opt_state=opt_state._replace(hyperparams=hp))

            out = {"train_error": train_error, "val_error": val_error,
                   "lr": lr_before}
            return FusedCarry(state, sched, best_val, best_params, best_stats, rng), out

        carry, metrics = jax.lax.scan(epoch_body, carry, train_ids)
        return carry, metrics

    return fused


def fused_trainer(
    *,
    train_body,
    eval_body,
    state: TrainState,
    data,
    train_idx,
    val_idx,
    batch_size: int,
    epochs: int,
    verbosity: int,
    lr: float,
    scheduler_kwargs: dict,
    scheduler_enabled: bool = True,
    rng_key,
    checkpoint_fn=None,
    shuffle_seed_base: int = 0,
    fused_fn=None,
    id_matrix_fn=None,
    meter=None,
):
    """Run `epochs` epochs, dispatching `verbosity`-sized chunks. Returns
    (best_state, last_state, final_sched_state). Pass a cached `fused_fn`
    (from make_fused_epochs_fn) to avoid retracing across calls.

    With a ThroughputMeter, each chunk is accounted via add_chunk — the
    first chunk of each distinct chunk length (a fresh compile) counts as
    warmup — and the XLA cost model's FLOPs/bytes per epoch are recorded
    once for MFU/roofline reporting."""
    import os

    from matdeeplearn_tpu.training.train import epoch_id_matrix

    has_val = len(val_idx) > 0
    fused = fused_fn or make_fused_epochs_fn(
        train_body, eval_body, has_val=has_val,
        scheduler_kwargs=scheduler_kwargs, scheduler_enabled=scheduler_enabled,
    )
    # Max seconds per fused dispatch (0 = unbounded). Chunk length only
    # affects host sync cadence (prints/checkpoints), never training
    # semantics, so it is safe to shrink adaptively. Motivation: the
    # r3 "padded-xla-46k crashes reproducibly" mystery bisected to single
    # XLA dispatches longer than ~60 s being killed by the tunneled TPU
    # worker (46k padded = 22.4 s/epoch × 3-epoch chunk; the same program
    # runs clean in 1-epoch chunks). Real TPU VMs tolerate long dispatches;
    # set MDL_MAX_DISPATCH_S when the runtime does not.
    max_dispatch_s = float(os.environ.get("MDL_MAX_DISPATCH_S", "0") or 0)
    idm = id_matrix_fn or partial(epoch_id_matrix, batch_size=batch_size)
    if max_dispatch_s > 0:
        # Probe a small scan to estimate the epoch's dispatch time; if even
        # ONE epoch would blow the budget, drive sub-epoch segments instead
        # of whole-epoch programs (semantics identical; host epoch loop).
        import time as _time

        ids0 = idm(train_idx, shuffle=True, seed=shuffle_seed_base + 1)
        S = ids0.shape[0]
        probe_rows = min(8, S)

        @jax.jit
        def _probe(state, data, ids_matrix, rng):
            def body(c, row):
                st, rng = c
                rng, sub = jax.random.split(rng)
                st, loss, cnt = train_body(st, data, row, sub)
                return (st, rng), loss

            (_, _), losses = jax.lax.scan(
                body, (state, rng_key), ids_matrix)
            return losses[-1]

        probe_ids = jnp.asarray(ids0[:probe_rows])
        float(_probe(state, data, probe_ids, rng_key))  # compile+run
        t0 = _time.time()
        float(_probe(state, data, probe_ids, rng_key))
        t_step = (_time.time() - t0) / probe_rows
        if t_step * S > max_dispatch_s:
            seg_rows = max(1, min(S, int(max_dispatch_s
                                         / max(t_step, 1e-9) / 1.5)))
            print(f"segmented dispatch: estimated epoch "
                  f"{t_step * S:.0f}s exceeds MDL_MAX_DISPATCH_S="
                  f"{max_dispatch_s:.0f}s; running {seg_rows} "
                  f"steps/dispatch")
            return _segmented_trainer(
                train_body=train_body, eval_body=eval_body, state=state,
                data=data, train_idx=train_idx, val_idx=val_idx,
                epochs=epochs, verbosity=verbosity, lr=lr,
                scheduler_kwargs=scheduler_kwargs,
                scheduler_enabled=scheduler_enabled, rng_key=rng_key,
                checkpoint_fn=checkpoint_fn, idm=idm, seg_rows=seg_rows,
                meter=meter, shuffle_seed_base=shuffle_seed_base,
            )
    val_ids = jnp.asarray(
        idm(val_idx, shuffle=False, seed=None)
        if has_val else np.zeros((1, batch_size), np.int32)
    )
    carry = FusedCarry(
        state=state,
        sched=plateau_init(lr),
        best_val=jnp.asarray(jnp.inf, jnp.float32),
        best_params=state.params,
        best_stats=state.batch_stats,
        rng=rng_key,
    )
    chunk = max(1, int(verbosity) or 5)
    import time

    t0 = time.time()
    epoch = 0
    while epoch < epochs:
        k = min(chunk, epochs - epoch)
        if max_dispatch_s > 0 and epoch > 0:
            # steady-state per-epoch time from the last chunk bounds the
            # next dispatch under the budget (warmup chunk excluded —
            # it includes compile)
            per_epoch = dt_chunk / max(k_last, 1)
            k = max(1, min(k, int(max_dispatch_s / max(per_epoch, 1e-9))))
        ids = np.stack([
            idm(train_idx, shuffle=True, seed=shuffle_seed_base + epoch + e + 1)
            for e in range(k)
        ])
        ids_dev = jnp.asarray(ids)
        carry, metrics = fused(carry, data, ids_dev, val_ids)
        epoch += k
        k_last = k
        train_err = float(metrics["train_error"][-1])
        val_err = float(metrics["val_error"][-1])
        lr_now = float(metrics["lr"][-1])
        dt_chunk = time.time() - t0
        dt = dt_chunk / k
        if meter is not None:
            # The first chunk of each distinct length traces+compiles a new
            # program shape — account it as warmup, not throughput. The key
            # persists on the meter, so later trainer calls that reuse the
            # compiled program (run.fused_fns) count as steady state.
            meter.add_chunk(k, k * ids.shape[1], dt_chunk,
                            key=("fused", k, ids.shape[1]))
            if meter.flops_per_epoch == 0.0:
                from matdeeplearn_tpu.utils.profiling import xla_cost

                cost = xla_cost(fused, carry, data, ids_dev, val_ids)
                if cost and cost["flops"] > 0:
                    meter.flops_per_epoch = cost["flops"] / k
                    meter.bytes_per_epoch = cost["bytes"] / k
        t0 = time.time()
        if verbosity:
            print(
                "Epoch: {:04d}, Learning Rate: {:.6f}, Training Error: {:.5f},"
                " Val Error: {:.5f}, Time per epoch (s): {:.5f}".format(
                    epoch, lr_now, train_err, val_err, dt
                )
            )
        if checkpoint_fn is not None:
            checkpoint_fn(carry)

    best_state = carry.state.replace(
        params=carry.best_params, batch_stats=carry.best_stats
    )
    return best_state, carry.state, carry.sched
