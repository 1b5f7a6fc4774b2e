"""The kernel/batching resolution matrix (training/jobs.py:_resolve_kernel)
— the perf contract's dispatch table, tested combo by combo."""

import pytest

from matdeeplearn_tpu.training.jobs import _resolve_kernel


def _tpu(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def test_auto_on_cpu_is_xla():
    # Pallas arms would run interpret mode on CPU — auto must stay XLA
    for model in ("CGCNN", "GCN", "MPNN", "SchNet", "MEGNet"):
        for batching in ("padded", "packed"):
            plan = _resolve_kernel(model, "auto", batching, False, 1)
            assert plan.name == "xla", (model, batching)


def test_auto_on_tpu_matrix(monkeypatch):
    _tpu(monkeypatch)
    # packed GNNs -> csr (46k-measured, BULK.md r5); MPNN composes
    for model, expect in (("CGCNN", "csr"), ("GCN", "csr"),
                          ("SchNet", "csr"), ("MEGNet", "csr"),
                          ("MPNN", "csr+fused")):
        assert _resolve_kernel(model, "auto", "packed", False, 1).name == expect
    # padded: CGCNN -> fused windowed, MPNN -> bilinear, others xla
    assert _resolve_kernel("CGCNN", "auto", "padded", False, 1).name == "fused"
    assert _resolve_kernel("MPNN", "auto", "padded", False, 1).name == "fused"
    assert _resolve_kernel("GCN", "auto", "padded", False, 1).name == "xla"


def test_csr_order_per_model(monkeypatch):
    _tpu(monkeypatch)
    # MEGNet aggregates at the source -> src-sorted; others dst
    assert _resolve_kernel("MEGNet", "csr", "packed", False, 1).csr_order == "src"
    assert _resolve_kernel("CGCNN", "csr", "packed", False, 1).csr_order == "dst"
    # override honored
    assert _resolve_kernel("MEGNet", "csr", "packed", False, 1,
                           "dst").csr_order == "dst"


def test_explicit_requests_honored_anywhere():
    # explicit kernels are honored on CPU (interpret mode)
    assert _resolve_kernel("CGCNN", "csr", "padded", False, 1).name == "csr"
    assert _resolve_kernel("CGCNN", "fused", "padded", False, 1).name == "fused"
    assert _resolve_kernel("GCN", "pallas", "padded", False, 1).name == "pallas"


def test_unavailable_falls_back_loudly(capsys):
    # streaming: csr/fused/pallas unavailable -> xla with a printed reason
    for kern in ("csr", "fused", "pallas"):
        plan = _resolve_kernel("CGCNN", kern, "padded", True, 1)
        assert plan.name == "xla"
        assert "requested but unavailable" in capsys.readouterr().out
    # descriptor models have no edge aggregation
    assert _resolve_kernel("SM", "csr", "padded", False, 1).name == "xla"


def test_ep_shards_disable_windowed(monkeypatch, capsys):
    _tpu(monkeypatch)
    # ep>1 shards the edge dim — windowed arms off; csr stays on (layout
    # harmless) but its kernels no-op on sharded edges, and the
    # resolution says so LOUDLY
    assert not _resolve_kernel("CGCNN", "fused", "padded", False, 2).use_windowed
    plan = _resolve_kernel("CGCNN", "csr", "padded", False, 2)
    assert plan.use_csr
    assert "edge shards disable the CSR kernels" in capsys.readouterr().out


def test_mpnn_fused_off_tpu_is_loud(capsys):
    # the bilinear kernel is TPU-only; an explicit fused request off-TPU
    # must not silently benchmark the einsum path
    plan = _resolve_kernel("MPNN", "fused", "padded", False, 1)
    assert plan.name == "xla"
    assert "TPU-only" in capsys.readouterr().out


def test_unknown_kernel_raises():
    with pytest.raises(ValueError, match="unknown kernel"):
        _resolve_kernel("CGCNN", "crs", "padded", False, 1)
