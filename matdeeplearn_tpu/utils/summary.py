"""Model parameter summary (reference models/utils.py:4-24)."""

from __future__ import annotations

import jax
import numpy as np


def model_summary(params, name: str = "model") -> int:
    """Print a named-parameter table + totals; returns total param count."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    print("--------------------------------------------")
    total = 0
    for path, leaf in flat:
        pname = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        n = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        total += n
        print(f"{pname:60s} {str(np.shape(leaf)):20s} {n:>10d}")
    print("--------------------------------------------")
    print(f"Total params ({name}): {total}")
    return total
