"""Layer numerics golden-tested against torch (CPU) — the reference's
substrate — to guarantee parity of BatchNorm/GRU/LSTM semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from matdeeplearn_tpu.nn import layers as L
from matdeeplearn_tpu.ops import segment


def test_linear_init_distribution():
    lin = L.Linear(64)
    v = lin.init(jax.random.PRNGKey(0), jnp.zeros((1, 100)))
    k = np.asarray(v["params"]["kernel"])
    bound = 1 / np.sqrt(100)
    assert k.min() >= -bound and k.max() <= bound
    assert abs(k.std() - bound / np.sqrt(3)) < 0.01  # U(-b,b) std = b/sqrt(3)


def test_linear_matches_torch(rng):
    x = rng.standard_normal((5, 7)).astype(np.float32)
    w = rng.standard_normal((3, 7)).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)
    tl = torch.nn.Linear(7, 3)
    with torch.no_grad():
        tl.weight.copy_(torch.tensor(w))
        tl.bias.copy_(torch.tensor(b))
    want = tl(torch.tensor(x)).detach().numpy()

    lin = L.Linear(3)
    v = {"params": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}}
    got = lin.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("track", [True, False])
def test_batchnorm_matches_torch(rng, track):
    x = rng.standard_normal((32, 6)).astype(np.float32) * 2 + 1
    tbn = torch.nn.BatchNorm1d(6, track_running_stats=track)
    bn = L.MaskedBatchNorm(track_stats=track)
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # training step
    tout = tbn(torch.tensor(x)).detach().numpy()
    out, mut = bn.apply(
        v, jnp.asarray(x), use_running_average=False,
        mutable=["batch_stats"] if track else [],
    )
    np.testing.assert_allclose(np.asarray(out), tout, atol=1e-4)

    if track:
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["var"]),
            tbn.running_var.numpy(), atol=1e-4,
        )
        # eval step uses running stats
        tbn.eval()
        x2 = rng.standard_normal((8, 6)).astype(np.float32)
        tout2 = tbn(torch.tensor(x2)).detach().numpy()
        v2 = {"params": v["params"], "batch_stats": mut["batch_stats"]}
        out2 = bn.apply(v2, jnp.asarray(x2), use_running_average=True)
        np.testing.assert_allclose(np.asarray(out2), tout2, atol=1e-4)


def test_batchnorm_masked_ignores_padding(rng):
    x = rng.standard_normal((10, 4)).astype(np.float32)
    xpad = np.concatenate([x, 99 * np.ones((6, 4), np.float32)])
    mask = np.concatenate([np.ones(10), np.zeros(6)]).astype(np.float32)
    bn = L.MaskedBatchNorm(track_stats=True)
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref, _ = bn.apply(
        v, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    got, _ = bn.apply(
        v, jnp.asarray(xpad), mask=jnp.asarray(mask),
        use_running_average=False, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(got)[:10], np.asarray(ref), atol=1e-5)


def test_gru_cell_matches_torch(rng):
    H, I = 8, 8
    tg = torch.nn.GRU(I, H)
    x = rng.standard_normal((4, I)).astype(np.float32)
    h = rng.standard_normal((4, H)).astype(np.float32)
    out, hn = tg(torch.tensor(x).unsqueeze(0), torch.tensor(h).unsqueeze(0))
    want = out.squeeze(0).detach().numpy()

    cell = L.GRUCell(H)
    sd = tg.state_dict()
    v = {"params": {
        "w_ih": jnp.asarray(sd["weight_ih_l0"].numpy().T),
        "w_hh": jnp.asarray(sd["weight_hh_l0"].numpy().T),
        "b_ih": jnp.asarray(sd["bias_ih_l0"].numpy()),
        "b_hh": jnp.asarray(sd["bias_hh_l0"].numpy()),
    }}
    got = cell.apply(v, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_lstm_cell_matches_torch(rng):
    H, I = 6, 12
    tl = torch.nn.LSTM(I, H)
    x = rng.standard_normal((3, I)).astype(np.float32)
    h = rng.standard_normal((3, H)).astype(np.float32)
    c = rng.standard_normal((3, H)).astype(np.float32)
    out, (hn, cn) = tl(
        torch.tensor(x).unsqueeze(0),
        (torch.tensor(h).unsqueeze(0), torch.tensor(c).unsqueeze(0)),
    )
    sd = tl.state_dict()
    cell = L.LSTMCell(H)
    v = {"params": {
        "w_ih": jnp.asarray(sd["weight_ih_l0"].numpy().T),
        "w_hh": jnp.asarray(sd["weight_hh_l0"].numpy().T),
        "b_ih": jnp.asarray(sd["bias_ih_l0"].numpy()),
        "b_hh": jnp.asarray(sd["bias_hh_l0"].numpy()),
    }}
    got_h, got_c = cell.apply(v, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(got_h), hn.squeeze(0).detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), cn.squeeze(0).detach().numpy(), atol=1e-5)


def test_shifted_softplus():
    assert abs(float(L.shifted_softplus(jnp.array(0.0)))) < 1e-7


def test_segment_ops_vs_numpy(rng):
    vals = rng.standard_normal((20, 3)).astype(np.float32)
    ids = rng.integers(0, 5, 20)
    mask = (rng.random(20) > 0.3).astype(np.float32)
    s = np.zeros((5, 3), np.float32)
    c = np.zeros(5, np.float32)
    for v, i, m in zip(vals, ids, mask):
        s[i] += v * m
        c[i] += m
    got_sum = segment.segment_sum(jnp.asarray(vals), jnp.asarray(ids), 5, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_sum), s, atol=1e-5)
    got_mean = segment.segment_mean(jnp.asarray(vals), jnp.asarray(ids), 5, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_mean), s / np.maximum(c, 1)[:, None], atol=1e-5)

    want_max = np.full((5, 3), -np.inf, np.float32)
    for v, i, m in zip(vals, ids, mask):
        if m:
            want_max[i] = np.maximum(want_max[i], v)
    want_max = np.where(np.isfinite(want_max), want_max, 0.0)
    got_max = segment.segment_max(jnp.asarray(vals), jnp.asarray(ids), 5, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_max), want_max, atol=1e-5)


def test_segment_softmax_masked(rng):
    vals = rng.standard_normal((12, 1)).astype(np.float32)
    ids = np.array([0] * 6 + [1] * 6)
    mask = np.ones(12, np.float32)
    mask[4:6] = 0
    p = segment.segment_softmax(jnp.asarray(vals), jnp.asarray(ids), 2, jnp.asarray(mask))
    p = np.asarray(p).ravel()
    assert abs(p[:6].sum() - 1.0) < 1e-5
    assert p[4] == 0 and p[5] == 0
    assert abs(p[6:].sum() - 1.0) < 1e-5
