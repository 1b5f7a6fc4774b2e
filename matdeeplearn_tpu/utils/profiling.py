"""Profiling and throughput observability.

The reference's only instrumentation is wall-clock prints (main.py:28,
228-241; training/training.py:139-140,199). First-class TPU metrics here:

  * ThroughputMeter — edges/s/chip, graphs/s, epochs/hr over a training
    run (the north-star counters from BASELINE.md),
  * trace() — context manager around jax.profiler for on-demand XLA/TPU
    traces (view with tensorboard or xprof), enabled per job via the
    `profile: "True"` / `profile_dir` job parameters.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class ThroughputMeter:
    """Accumulates work counters over epochs and reports rates.

    edges/s is the SpMM-equivalent workload rate (messages aggregated per
    second); per-chip rates divide by the device count actually used.
    """

    num_devices: int = 1
    edges_per_epoch: float = 0.0
    graphs_per_epoch: float = 0.0
    epochs: int = 0
    _t0: float = field(default_factory=time.perf_counter)

    def start(self):
        self._t0 = time.perf_counter()
        self.epochs = 0
        return self

    def tick(self, epochs: int = 1):
        self.epochs += epochs

    @property
    def elapsed(self) -> float:
        return max(time.perf_counter() - self._t0, 1e-9)

    def rates(self) -> dict:
        el = self.elapsed
        eps = self.epochs / el
        return {
            "epochs": self.epochs,
            "wall_s": round(el, 3),
            "epochs_per_hr": round(eps * 3600.0, 2),
            "edges_per_s": round(self.edges_per_epoch * eps, 1),
            "edges_per_s_per_chip": round(
                self.edges_per_epoch * eps / max(self.num_devices, 1), 1
            ),
            "graphs_per_s": round(self.graphs_per_epoch * eps, 1),
        }

    def report(self) -> str:
        r = self.rates()
        return (
            "Throughput: {edges_per_s_per_chip:,.0f} edges/s/chip "
            "({edges_per_s:,.0f} edges/s), {graphs_per_s:,.0f} graphs/s, "
            "{epochs_per_hr:,.1f} epochs/hr over {epochs} epochs".format(**r)
        )


@contextlib.contextmanager
def trace(log_dir: str | None, enabled: bool = True):
    """jax.profiler trace context; no-op when disabled or log_dir is None."""
    if not enabled or not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def meter_for_training(dataset, train_idx, mesh=None) -> ThroughputMeter:
    """Meter sized to one training epoch over train_idx."""
    import numpy as np

    idx = np.asarray(train_idx)
    n_dev = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    return ThroughputMeter(
        num_devices=n_dev,
        edges_per_epoch=float(dataset.edge_counts()[idx].sum()),
        graphs_per_epoch=float(len(idx)),
    )
