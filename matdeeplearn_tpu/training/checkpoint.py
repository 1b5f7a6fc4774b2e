"""Checkpoint format: single-file msgpack pytree checkpoints.

The reference pickles whole torch modules into .pth files ("full_model",
training/training.py:145-155) and unpickles them at predict time (:566) —
arbitrary code execution on load. Documented divergence: we serialize a pure
pytree state dict (params, batch_stats, optimizer state, scheduler state)
plus a JSON config header via flax.serialization msgpack — no code objects,
safely loadable, and enough to rebuild the model by registry name.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from matdeeplearn_tpu.training.train import TrainState


def save_checkpoint(
    path: str,
    state: TrainState,
    scheduler,
    model_name: str,
    model_config: dict,
    extra_meta: dict | None = None,
):
    # Multi-controller discipline: only process 0 writes checkpoints (the
    # reference's rank-0 checkpoint gate, training/training.py:143-155);
    # every process still computes the same state.
    if jax.process_index() != 0:
        return
    meta = {
        "model_name": model_name,
        "model_config": model_config,
        "scheduler": scheduler.state_dict() if scheduler is not None else None,
        **(extra_meta or {}),
    }
    payload = {
        "meta": json.dumps(meta),
        "state": serialization.to_state_dict(
            jax.tree.map(np.asarray, state)
        ),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, state_template: TrainState | None = None):
    """Returns (meta dict, state). With a template, the state is restored
    into that pytree structure; without one, the raw nested state dict is
    returned (enough to rebuild params/batch_stats for inference)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(payload["meta"])
    raw = payload["state"]
    if state_template is not None:
        state = serialization.from_state_dict(state_template, raw)
        return meta, state
    return meta, raw


def params_from_raw(raw_state: dict):
    """Extract (params, batch_stats) pytrees (as jnp arrays) from a raw
    checkpoint state dict — the inference path (reference predict(),
    training/training.py:559-566, minus the pickle)."""
    to_jnp = lambda t: jax.tree.map(jnp.asarray, t)
    return to_jnp(raw_state["params"]), to_jnp(raw_state.get("batch_stats", {}))
