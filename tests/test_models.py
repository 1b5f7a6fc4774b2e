"""Model zoo: forward shapes, jit, and padding-invariance.

Padding-invariance is the load-bearing correctness property of the
static-shape design: adding pad nodes/edges/graphs must not change any real
prediction.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matdeeplearn_tpu.data import BatchSpec, DeviceDataset, assemble_batch
from matdeeplearn_tpu.models import MODEL_REGISTRY, build_model

GNN_NAMES = ["CGCNN", "MPNN", "SchNet", "MEGNet", "GCN"]


def _batch(toy_dataset, batch_size=6, extra_pad=0):
    ds = toy_dataset
    dd = DeviceDataset.from_graph_dataset(ds)
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), batch_size)
    if extra_pad:
        spec = BatchSpec(
            spec.num_graphs + extra_pad,
            spec.num_nodes + 8 * extra_pad,
            spec.num_edges + 8 * extra_pad,
        )
    ids = np.arange(batch_size, dtype=np.int32)
    if extra_pad:
        ids = np.concatenate([ids, np.full(extra_pad, -1, np.int32)])
    return assemble_batch(dd, jnp.asarray(ids), spec)


@pytest.mark.parametrize("name", GNN_NAMES)
def test_forward_shape_and_jit(toy_dataset, name):
    b = _batch(toy_dataset)
    model = build_model(name, toy_dataset, {"dim1": 16, "dim2": 16, "dim3": 16,
                                            "gc_count": 2, "post_fc_count": 1})
    v = model.init(jax.random.PRNGKey(0), b, training=False)
    out = jax.jit(lambda v, b: model.apply(v, b, training=False))(v, b)
    assert out.shape == (b.num_graphs,)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", GNN_NAMES)
def test_padding_invariance(toy_dataset, name):
    model = build_model(name, toy_dataset, {"dim1": 16, "dim2": 16, "dim3": 16,
                                            "gc_count": 2, "post_fc_count": 1})
    b1 = _batch(toy_dataset, 6, extra_pad=0)
    b2 = _batch(toy_dataset, 6, extra_pad=3)
    v = model.init(jax.random.PRNGKey(0), b1, training=False)
    out1 = model.apply(v, b1, training=False)
    out2 = model.apply(v, b2, training=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2)[:6], atol=2e-5)


@pytest.mark.parametrize("name", GNN_NAMES)
@pytest.mark.parametrize("pool", ["global_add_pool", "global_max_pool", "set2set"])
def test_pool_variants(toy_dataset, name, pool):
    if name == "MEGNet" and pool == "global_add_pool":
        pool = "global_sum_pool"  # reference MEGNet maps only sum/mean/max
    model = build_model(name, toy_dataset, {"dim1": 8, "dim2": 8, "dim3": 8,
                                            "gc_count": 1, "post_fc_count": 1,
                                            "pool": pool})
    b = _batch(toy_dataset)
    v = model.init(jax.random.PRNGKey(0), b, training=False)
    out = model.apply(v, b, training=False)
    assert out.shape == (b.num_graphs,)


@pytest.mark.parametrize("name", GNN_NAMES)
def test_late_pool_order(toy_dataset, name):
    model = build_model(name, toy_dataset, {"dim1": 8, "dim2": 8, "dim3": 8,
                                            "gc_count": 1, "post_fc_count": 1,
                                            "pool_order": "late"})
    b = _batch(toy_dataset)
    v = model.init(jax.random.PRNGKey(0), b, training=False)
    out = model.apply(v, b, training=False)
    assert out.shape == (b.num_graphs,)


def test_no_pre_fc(toy_dataset):
    model = build_model("CGCNN", toy_dataset, {"pre_fc_count": 0, "dim1": 8,
                                               "dim2": 8, "gc_count": 1,
                                               "post_fc_count": 0})
    b = _batch(toy_dataset)
    v = model.init(jax.random.PRNGKey(0), b, training=False)
    out = model.apply(v, b, training=False)
    assert out.shape == (b.num_graphs,)


def test_batchnorm_state_updates(toy_dataset):
    model = build_model("CGCNN", toy_dataset, {"dim1": 8, "dim2": 8,
                                               "gc_count": 1, "post_fc_count": 1})
    b = _batch(toy_dataset)
    v = model.init(jax.random.PRNGKey(0), b, training=False)
    assert "batch_stats" in v
    out, mut = model.apply(v, b, training=True, mutable=["batch_stats"])
    before = np.asarray(v["batch_stats"]["bn0"]["mean"])
    after = np.asarray(mut["batch_stats"]["bn0"]["mean"])
    assert not np.allclose(before, after)


def test_descriptor_model(toy_dataset):
    ds = dataclasses.replace(
        toy_dataset,
        extra_features={"SM": np.random.default_rng(0)
                        .standard_normal((len(toy_dataset), 12)).astype(np.float32)},
    )
    dd = DeviceDataset.from_graph_dataset(ds)
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), 4)
    b = assemble_batch(dd, jnp.arange(4, dtype=jnp.int32), spec)
    model = build_model("SM", ds, {"dim1": 8, "fc_count": 2})
    v = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(v, b)
    assert out.shape == (4,)


def test_registry_complete():
    assert set(MODEL_REGISTRY) == {"CGCNN", "MPNN", "SchNet", "MEGNet", "GCN", "SM", "SOAP"}


def test_mpnn_fused_bilinear_matches_xla(toy_dataset):
    """kernel=fused MPNN (Pallas bilinear message, interpret mode on CPU)
    matches the kernel=xla einsum path: identical params, same outputs."""
    import jax
    import jax.numpy as jnp

    from matdeeplearn_tpu.data.batching import (
        BatchSpec,
        DeviceDataset,
        assemble_batch,
    )
    from matdeeplearn_tpu.models import build_model
    from matdeeplearn_tpu.training import train as T
    from matdeeplearn_tpu.training.optimizers import build_optimizer

    ds = toy_dataset
    dd = DeviceDataset.from_graph_dataset(ds)
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), 6)
    batch = assemble_batch(dd, jnp.arange(6, dtype=jnp.int32), spec)
    base = {"dim1": 12, "dim2": 12, "dim3": 10, "gc_count": 2,
            "post_fc_count": 1, "batch_norm": False}
    m_x = build_model("MPNN", ds, {**base, "kernel": "xla"})
    m_f = build_model("MPNN", ds, {**base, "kernel": "fused"})
    tx = build_optimizer("SGD", 0.1, {})
    state = T.init_state(m_x, tx, batch, 0)
    out_x = m_x.apply({"params": state.params}, batch, training=False)
    # CPU: fused=... gated on backend==tpu, so force via direct monkey-ish
    # construction — apply the fused model only if it actually differs.
    out_f = m_f.apply({"params": state.params}, batch, training=False)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_f),
                               rtol=1e-5, atol=1e-5)


def test_fused_bilinear_op_parity(toy_dataset):
    """Direct op-level parity of the Pallas bilinear kernel in interpret
    mode (the TPU-measured x2 win path), fwd + grads."""
    import jax
    import jax.numpy as jnp

    from matdeeplearn_tpu.ops.pallas_bilinear import (
        _reference_compose,
        fused_bilinear_msg,
    )

    rng = np.random.default_rng(3)
    E, D, H, K = 300, 10, 8, 10
    xj = jnp.asarray(rng.standard_normal((E, D)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((E, H)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((H, D * K)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(D * K) * 0.1, jnp.float32)
    cfg = (128, True)
    out = fused_bilinear_msg(cfg, xj, a, w1, b1)
    ref = _reference_compose(xj, a, w1, b1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    cot = jnp.asarray(rng.standard_normal((E, K)), jnp.float32)
    gf = jax.grad(lambda *p: jnp.sum(fused_bilinear_msg(cfg, *p) * cot),
                  argnums=(0, 1, 2, 3))(xj, a, w1, b1)
    gr = jax.grad(lambda *p: jnp.sum(_reference_compose(*p) * cot),
                  argnums=(0, 1, 2, 3))(xj, a, w1, b1)
    for n, x_, y_ in zip(("xj", "a", "w1", "b1"), gf, gr):
        sc = max(float(jnp.abs(y_).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_),
                                   rtol=1e-4, atol=1e-5 * sc,
                                   err_msg=f"grad {n}")

    # mxu_bf16 cfg arm: bf16 MXU operands + f32 accumulation — same math
    # within bf16 truncation error (~1e-2 relative).
    cfg16 = (128, True, True)
    out16 = fused_bilinear_msg(cfg16, xj, a, w1, b1)
    sc = max(float(jnp.abs(ref).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(ref),
                               rtol=3e-2, atol=3e-2 * sc)
    gf16 = jax.grad(lambda *p: jnp.sum(fused_bilinear_msg(cfg16, *p) * cot),
                    argnums=(0, 1, 2, 3))(xj, a, w1, b1)
    for n, x_, y_ in zip(("xj", "a", "w1", "b1"), gf16, gr):
        sc = max(float(jnp.abs(y_).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_),
                                   rtol=5e-2, atol=3e-2 * sc,
                                   err_msg=f"bf16 grad {n}")

    # chunked-contraction forward (the TPU default, forced here in
    # interpret mode via cfg[3]): same math incl. the H→Hp zero-pad and
    # transposed-activation layout. cfg[3]=True also selects the distinct
    # _bwd_kernel_chunked, covered by the gck grad checks below.
    cfg_ck = (128, True, False, True)
    out_ck = fused_bilinear_msg(cfg_ck, xj, a, w1, b1)
    np.testing.assert_allclose(np.asarray(out_ck), np.asarray(ref),
                               rtol=1e-4, atol=1e-4 * sc)
    gck = jax.grad(lambda *p: jnp.sum(fused_bilinear_msg(cfg_ck, *p) * cot),
                   argnums=(0, 1, 2, 3))(xj, a, w1, b1)
    for n, x_, y_ in zip(("xj", "a", "w1", "b1"), gck, gr):
        sc = max(float(jnp.abs(y_).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_),
                                   rtol=1e-4, atol=1e-4 * sc,
                                   err_msg=f"chunked grad {n}")

    # regression: the chunked backward re-tiles from te to tb=min(te,256);
    # when round_up(E, te) > round_up(E, tb) the re-pad must slice back to
    # E first (production crash at te=512, E=700-class shapes).
    E2 = 700
    xj2 = jnp.asarray(rng.standard_normal((E2, D)), jnp.float32)
    a2 = jnp.asarray(rng.standard_normal((E2, H)), jnp.float32)
    cot2 = jnp.asarray(rng.standard_normal((E2, K)), jnp.float32)
    cfg512 = (512, True, False, True)
    g2 = jax.grad(lambda *p: jnp.sum(fused_bilinear_msg(cfg512, *p) * cot2),
                  argnums=(0, 1, 2, 3))(xj2, a2, w1, b1)
    g2r = jax.grad(lambda *p: jnp.sum(_reference_compose(*p) * cot2),
                   argnums=(0, 1, 2, 3))(xj2, a2, w1, b1)
    for n, x_, y_ in zip(("xj", "a", "w1", "b1"), g2, g2r):
        sc = max(float(jnp.abs(y_).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_),
                                   rtol=1e-4, atol=1e-4 * sc,
                                   err_msg=f"retile grad {n}")

    # regression: the chunked FORWARD's te→tf=min(te,1024) re-tile must
    # also pad relative to the true E, not the te-padded row count
    # (pad = ep - xj.shape[0] went negative for te>2048-class tiles —
    # jnp.pad raises "index can't contain negative values" — and produced
    # a wrong row count for 1024<te<2048; ADVICE r4 medium).
    E3 = 1030
    xj3 = jnp.asarray(rng.standard_normal((E3, D)), jnp.float32)
    a3 = jnp.asarray(rng.standard_normal((E3, H)), jnp.float32)
    ref3 = _reference_compose(xj3, a3, w1, b1)
    for te_big in (1500, 2500):
        out3 = fused_bilinear_msg((te_big, True, False, True),
                                  xj3, a3, w1, b1)
        sc = max(float(jnp.abs(ref3).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3),
                                   rtol=1e-4, atol=1e-4 * sc,
                                   err_msg=f"fwd retile te={te_big}")
