"""Observability: throughput meter math, jax.profiler trace capture, and
the multi-host initializer's single-host no-op."""

import glob
import os
import time

import numpy as np

from matdeeplearn_tpu.utils.profiling import ThroughputMeter, meter_for_training, trace


def test_meter_rates():
    m = ThroughputMeter(num_devices=4, edges_per_epoch=1000.0,
                        graphs_per_epoch=10.0).start()
    time.sleep(0.05)
    m.tick(5)
    r = m.rates()
    assert r["epochs"] == 5
    assert r["edges_per_s"] > 0
    np.testing.assert_allclose(
        r["edges_per_s_per_chip"], r["edges_per_s"] / 4, rtol=0.01
    )
    assert "edges/s/chip" in m.report()


def test_meter_for_training(toy_dataset):
    idx = np.array([0, 2, 4])
    m = meter_for_training(toy_dataset, idx)
    assert m.edges_per_epoch == toy_dataset.edge_counts()[idx].sum()
    assert m.graphs_per_epoch == 3
    assert m.num_devices == 1


def test_trace_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "trace")
    with trace(d, enabled=True):
        jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert files, "no profiler artifacts written"


def test_trace_noop_when_disabled(tmp_path):
    d = str(tmp_path / "off")
    with trace(d, enabled=False):
        pass
    assert not os.path.exists(d)


def test_maybe_initialize_distributed_noop(monkeypatch):
    from matdeeplearn_tpu.parallel import maybe_initialize_distributed

    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert maybe_initialize_distributed() is False
