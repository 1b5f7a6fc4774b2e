"""Output CSV writers (reference write_results, training/training.py:211-223).

Multi-controller discipline: every process computes, only process 0 writes
(the reference's rank-0-only output gating, training/training.py:130-136).
"""

from __future__ import annotations

import csv

import numpy as np


def _is_writer_process() -> bool:
    import jax

    try:
        return jax.process_index() == 0
    except Exception:
        return True


def write_results(ids, targets, predictions, filename: str):
    """Write `ids, target..., prediction...` rows with the reference's header
    (column counts inferred from target width). No-op off process 0."""
    if not _is_writer_process():
        return
    targets = np.asarray(targets)
    predictions = np.asarray(predictions)
    if targets.ndim == 1:
        targets = targets[:, None]
    if predictions.ndim == 1:
        predictions = predictions[:, None]
    t = targets.shape[1]
    p = predictions.shape[1]
    with open(filename, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["ids"] + ["target"] * t + ["prediction"] * p)
        for i, row_id in enumerate(ids):
            w.writerow(
                [row_id]
                + [f"{v:.8g}" for v in targets[i]]
                + [f"{v:.8g}" for v in predictions[i]]
            )


def write_errorvalues(errors: dict, filename: str):
    """`<job>_errorvalues.csv` — one header row + one value row."""
    if not _is_writer_process():
        return
    with open(filename, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(list(errors.keys()))
        w.writerow([f"{v:.8g}" for v in errors.values()])
