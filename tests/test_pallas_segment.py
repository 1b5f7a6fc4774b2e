"""Windowed MXU segment-sum/gather kernels vs XLA references (interpret
mode on CPU; the same code path compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matdeeplearn_tpu.ops import pallas_segment as PS


def _sorted_edges(rng, e, n):
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    # guarantee every node appears (self-loop invariant of the featurizer)
    dst[:n] = np.arange(n)
    dst = np.sort(dst)
    return dst


@pytest.mark.parametrize("e,n,d", [(96, 40, 16), (256, 100, 8)])
def test_windowize_layout(rng, e, n, d):
    tw, te = 16, 32
    dst = _sorted_edges(rng, e, n)
    mask = np.ones(e, np.float32)
    mask[-5:] = 0
    dst[-5:] = n - 1  # pads parked at the tail with the last dst
    we = PS.windowize_edges(jnp.asarray(dst), jnp.asarray(mask), n, tw, te)
    order = np.asarray(we.order)
    wdst = np.asarray(we.dst)
    valid = np.asarray(we.valid)
    # every real edge appears exactly once
    real = np.where(mask > 0)[0]
    assert sorted(order[valid > 0].tolist()) == sorted(real.tolist())
    # window invariant: dst of slot s lies in its window
    nw, ew = PS.windowed_sizes(n, e, tw, te)
    assert wdst.shape[0] == ew
    tile_wid = np.asarray(we.window_id)
    for t in range(we.num_tiles):
        seg = wdst[t * te : (t + 1) * te]
        seg = seg[seg >= 0]
        if len(seg):
            assert (seg // tw == tile_wid[t]).all()
    # first_tile marks each window exactly once (every window has >=1 tile)
    assert np.asarray(we.first_tile).sum() == PS.windowed_sizes(n, e, tw, te)[0]


@pytest.mark.parametrize("e,n,d", [(128, 48, 8), (512, 200, 32)])
def test_windowed_segment_sum_matches_xla(rng, e, n, d):
    tw, te = 16, 64
    dst = _sorted_edges(rng, e, n)
    mask = np.ones(e, np.float32)
    mask[-7:] = 0
    dst[-7:] = dst[-8]
    msgs = rng.standard_normal((e, d)).astype(np.float32)

    want = jax.ops.segment_sum(
        jnp.asarray(msgs * mask[:, None]), jnp.asarray(dst), num_segments=n
    )

    we = PS.windowize_edges(jnp.asarray(dst), jnp.asarray(mask), n, tw, te)
    wmsgs = jnp.asarray(msgs)[we.order]
    got = PS.windowed_segment_sum(wmsgs, we, n, tw, te, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_windowed_gather_matches_xla(rng):
    e, n, d, tw, te = 160, 64, 8, 16, 32
    dst = _sorted_edges(rng, e, n)
    mask = np.ones(e, np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    we = PS.windowize_edges(jnp.asarray(dst), jnp.asarray(mask), n, tw, te)
    got = PS.windowed_gather(jnp.asarray(x), we, tw, te, True)
    want = np.where(
        np.asarray(we.dst)[:, None] >= 0,
        x[np.clip(np.asarray(we.dst), 0, n - 1)],
        0.0,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_windowed_segment_sum_grad(rng):
    e, n, d, tw, te = 96, 32, 8, 16, 32
    dst = _sorted_edges(rng, e, n)
    mask = np.ones(e, np.float32)
    msgs = rng.standard_normal((e, d)).astype(np.float32)
    we = PS.windowize_edges(jnp.asarray(dst), jnp.asarray(mask), n, tw, te)
    wmsgs = jnp.asarray(msgs)[we.order]
    cot = rng.standard_normal((n, d)).astype(np.float32)

    def f(m):
        return jnp.sum(PS.windowed_segment_sum(m, we, n, tw, te, True) * cot)

    g = jax.grad(f)(wmsgs)
    # d/dm[e] = cot[dst[e]]
    want = np.where(
        np.asarray(we.dst)[:, None] >= 0,
        cot[np.clip(np.asarray(we.dst), 0, n - 1)],
        0.0,
    )
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-5)


def test_empty_window_zeroed(rng):
    # nodes 16..31 form a window with no edges at all → zeros
    e, n, d, tw, te = 32, 48, 8, 16, 16
    dst = np.concatenate([
        np.sort(rng.integers(0, 16, 16)),
        np.sort(rng.integers(32, 48, 16)),
    ]).astype(np.int32)
    mask = np.ones(e, np.float32)
    msgs = rng.standard_normal((e, d)).astype(np.float32)
    we = PS.windowize_edges(jnp.asarray(dst), jnp.asarray(mask), n, tw, te)
    wmsgs = jnp.asarray(msgs)[we.order]
    out = PS.windowed_segment_sum(wmsgs, we, n, tw, te, True)
    want = jax.ops.segment_sum(jnp.asarray(msgs), jnp.asarray(dst), num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
    assert np.abs(np.asarray(out)[16:32]).max() == 0


@pytest.mark.parametrize("e,n,d", [(128, 48, 8), (512, 200, 32)])
def test_windowed_spmm_matches_xla(rng, e, n, d):
    """Fused weighted segment-sum (SpMM): out = A_w @ msgs with the edge
    weights as A's nonzeros, fwd and bwd (custom VJP wrt both operands)."""
    tw, te = 16, 64
    dst = _sorted_edges(rng, e, n)
    mask = np.ones(e, np.float32)
    mask[-7:] = 0
    dst[-7:] = dst[-8]
    msgs = rng.standard_normal((e, d)).astype(np.float32)
    w = rng.standard_normal(e).astype(np.float32)

    want = jax.ops.segment_sum(
        jnp.asarray(msgs * (w * mask)[:, None]), jnp.asarray(dst),
        num_segments=n,
    )
    we = PS.windowize_edges(jnp.asarray(dst), jnp.asarray(mask), n, tw, te)
    wmsgs = jnp.asarray(msgs)[we.order]
    ww = jnp.asarray(w)[we.order]
    got = PS.windowed_spmm(ww, wmsgs, we, n, tw, te, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # VJP vs the XLA formulation: cotangents for weights and messages.
    cot = rng.standard_normal((n, d)).astype(np.float32)

    def f_pallas(wv, mv):
        return jnp.vdot(PS.windowed_spmm(wv, mv, we, n, tw, te, True),
                        jnp.asarray(cot))

    def f_xla(wv, mv):
        valid = we.valid
        out = jax.ops.segment_sum(
            mv * (wv * valid)[:, None], jnp.maximum(we.dst, 0), num_segments=n
        )
        return jnp.vdot(out, jnp.asarray(cot))

    gw_p, gm_p = jax.grad(f_pallas, argnums=(0, 1))(ww, wmsgs)
    gw_x, gm_x = jax.grad(f_xla, argnums=(0, 1))(ww, wmsgs)
    valid = np.asarray(we.valid) > 0
    np.testing.assert_allclose(
        np.asarray(gw_p)[valid], np.asarray(gw_x)[valid], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gm_p)[valid], np.asarray(gm_x)[valid], atol=1e-5
    )


def test_gcn_windowed_weighted_path_matches_xla_path(toy_dataset):
    """GCN end-to-end: windowed batches (fused SpMM aggregation) vs plain
    padded batches must produce identical outputs for identical params."""
    import jax.random as jr

    from matdeeplearn_tpu.data import BatchSpec, DeviceDataset
    from matdeeplearn_tpu.data.batching import (
        WindowedDeviceData,
        assemble_batch_windowed,
    )
    from matdeeplearn_tpu.models import build_model
    from matdeeplearn_tpu.training import train as T
    from matdeeplearn_tpu.training.optimizers import build_optimizer

    ds = toy_dataset
    model = build_model("GCN", ds, {"dim1": 16, "dim2": 16, "gc_count": 2,
                                    "post_fc_count": 1, "batch_norm": False})
    tx = build_optimizer("SGD", 0.1, {})
    data = DeviceDataset.from_graph_dataset(ds)
    B = 4
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), B)
    ids = jnp.arange(B, dtype=jnp.int32)
    batch = T.assemble_batch(data, ids, spec)
    state = T.init_state(model, tx, batch, 0)
    ref = model.apply({"params": state.params}, batch, training=False)

    layout = ds.windowed_layout()
    wspec = BatchSpec.for_dataset(
        layout.node_counts_w, layout.wedge_counts, B,
        align=layout.tw, align_edges=layout.te,
    )
    wdata = data.replace(windowed=WindowedDeviceData.from_layout(layout))
    wbatch = assemble_batch_windowed(
        wdata, wdata.windowed, ids, wspec, layout.tw, layout.te
    )
    got = model.apply({"params": state.params}, wbatch, training=False)
    np.testing.assert_allclose(
        np.asarray(got)[:B], np.asarray(ref)[:B], atol=2e-4, rtol=2e-4
    )


def test_windowed_segment_sum_bf16_mode(rng):
    """Single-pass bf16 aggregation (kernel_precision: "bf16"): half the
    MXU work, bounded relative error vs the f32 reference."""
    e, n, d, tw, te = 512, 200, 32, 16, 64
    dst = _sorted_edges(rng, e, n)
    mask = np.ones(e, np.float32)
    msgs = rng.standard_normal((e, d)).astype(np.float32)

    want = jax.ops.segment_sum(
        jnp.asarray(msgs), jnp.asarray(dst), num_segments=n
    )
    we = PS.windowize_edges(jnp.asarray(dst), jnp.asarray(mask), n, tw, te)
    wmsgs = jnp.asarray(msgs)[we.order]
    got = PS.windowed_segment_sum(wmsgs, we, n, tw, te, True, False)
    scale = float(jnp.max(jnp.abs(want)))
    err = float(jnp.max(jnp.abs(got - want)))
    # bf16-class bound; in interpret mode the dot is exact f32 (the
    # truncation is an MXU hardware behavior), on TPU err lands ~2e-3·scale
    assert err <= 1e-2 * scale

    # VJP stays wired in bf16 mode
    g = jax.grad(lambda m: PS.windowed_segment_sum(
        m, we, n, tw, te, True, False).sum())(wmsgs)
    assert np.isfinite(np.asarray(g)).all()
