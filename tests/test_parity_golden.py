"""Per-layer numerical parity vs independent pure-torch oracles of the PyG
operator math the reference uses (VERDICT r1 missing #2).

PyG itself is not installed in this image, so each oracle re-implements the
documented PyG semantics with plain torch ops (index_add scatter) and fixed
weights; the flax layers get the *same* weights copied in and must match to
<=1e-5 on an irregular two-graph batch with pad slots. Operators covered:

  CGConv              (reference models/cgcnn.py:80-82)
  NNConv + GRU        (reference models/mpnn.py:83-90)
  SchNet Interaction  (reference models/schnet.py:81; PyG CFConv)
  GCNConv             (reference models/gcn.py:80-82, improved/add_self_loops
                       inert: graphs carry zero-weight self-loops)
  MEGNet MetaLayer    (reference models/megnet.py:16-147)
  Set2Set             (PyG nn.glob.Set2Set; reference pool="set2set")
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from matdeeplearn_tpu.data.batching import GraphBatch
from matdeeplearn_tpu.nn import conv as C
from matdeeplearn_tpu.nn.layers import MLP
from matdeeplearn_tpu.nn.pool import Set2Set

torch.manual_seed(0)

F_NODE = 12   # node feature width entering the convs
F_EDGE = 10   # edge attr width (Gaussian channels)
DIM = 8
N1, N2 = 5, 4           # true nodes per graph
E1, E2 = 11, 7          # true edges per graph
N, E = N1 + N2, E1 + E2
N_PAD, E_PAD, B = 12, 24, 3  # padded sizes; one pad graph slot


def _rng():
    return np.random.default_rng(1234)


def _toy_graph():
    """Irregular 2-graph batch; returns (unpadded numpy arrays, GraphBatch)."""
    rng = _rng()
    x = rng.standard_normal((N, F_NODE)).astype(np.float32)
    # batch-global edges, each graph's edges within its node range
    src1 = rng.integers(0, N1, E1)
    dst1 = rng.integers(0, N1, E1)
    src2 = rng.integers(N1, N, E2)
    dst2 = rng.integers(N1, N, E2)
    src = np.concatenate([src1, src2]).astype(np.int32)
    dst = np.concatenate([dst1, dst2]).astype(np.int32)
    eattr = rng.standard_normal((E, F_EDGE)).astype(np.float32)
    ew = (rng.random(E) * 7.9 + 0.1).astype(np.float32)

    pad_n, pad_e = N_PAD - N, E_PAD - E
    batch = GraphBatch(
        x=jnp.asarray(np.pad(x, ((0, pad_n), (0, 0)))),
        edge_src=jnp.asarray(np.pad(src, (0, pad_e))),
        edge_dst=jnp.asarray(np.pad(dst, (0, pad_e))),
        edge_weight=jnp.asarray(np.pad(ew, (0, pad_e))),
        edge_dist_norm=jnp.zeros(E_PAD, jnp.float32),
        node_graph=jnp.asarray(
            np.concatenate([np.zeros(N1), np.ones(N2), np.full(pad_n, B)]
                           ).astype(np.int32)),
        node_mask=jnp.asarray((np.arange(N_PAD) < N).astype(np.float32)),
        edge_mask=jnp.asarray((np.arange(E_PAD) < E).astype(np.float32)),
        graph_mask=jnp.asarray(np.array([1.0, 1.0, 0.0], np.float32)),
        y=jnp.zeros((B, 1), jnp.float32),
        u=jnp.zeros((B, 3), jnp.float32),
        n_node=jnp.asarray(np.array([N1, N2, 0], np.int32)),
    )
    return x, src, dst, eattr, ew, batch


def _scatter(values: torch.Tensor, index: np.ndarray, n: int, reduce="sum"):
    """torch_scatter.scatter equivalent at dim 0 (sum or mean)."""
    out = torch.zeros((n,) + values.shape[1:], dtype=values.dtype)
    idx = torch.as_tensor(index, dtype=torch.long)
    out.index_add_(0, idx, values)
    if reduce == "mean":
        cnt = torch.zeros(n, dtype=values.dtype)
        cnt.index_add_(0, idx, torch.ones(len(index), dtype=values.dtype))
        out = out / cnt.clamp(min=1.0).unsqueeze(-1)
    return out


def _lin(tw: torch.nn.Linear):
    """torch Linear -> flax {kernel, bias} (kernel is weight.T)."""
    p = {"kernel": jnp.asarray(tw.weight.detach().numpy().T)}
    if tw.bias is not None:
        p["bias"] = jnp.asarray(tw.bias.detach().numpy())
    return p


def _close(a, b, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), b.detach().numpy(), atol=atol,
                               rtol=1e-5)


def test_cgconv_matches_pyg_math():
    x, src, dst, eattr, ew, batch = _toy_graph()
    lin_f = torch.nn.Linear(2 * F_NODE + F_EDGE, F_NODE)
    lin_s = torch.nn.Linear(2 * F_NODE + F_EDGE, F_NODE)
    tx, te = torch.as_tensor(x), torch.as_tensor(eattr)
    # PyG CGConv: z = [x_i || x_j || e]; out = x + mean_dst(sigmoid(f) * softplus(s))
    z = torch.cat([tx[dst], tx[src], te], dim=1)
    msg = torch.sigmoid(lin_f(z)) * torch.nn.functional.softplus(lin_s(z))
    want = tx + _scatter(msg, dst, N, "mean")

    params = {"lin_f": _lin(lin_f), "lin_s": _lin(lin_s)}
    got = C.CGConv(dim=F_NODE).apply(
        {"params": params}, batch.x, batch, jnp.asarray(
            np.pad(eattr, ((0, E_PAD - E), (0, 0))))
    )
    _close(got[:N], want)


def test_nnconv_and_gru_match_pyg_math():
    x, src, dst, eattr, ew, batch = _toy_graph()
    dim3 = 6
    e0 = torch.nn.Linear(F_EDGE, dim3)
    e1 = torch.nn.Linear(dim3, F_NODE * F_NODE)
    root = torch.randn(F_NODE, F_NODE) * 0.3
    bias = torch.randn(F_NODE) * 0.1
    tx, te = torch.as_tensor(x), torch.as_tensor(eattr)
    # PyG NNConv: msg_e = x_src @ W(e); out = mean_dst(msg) + x @ root + bias
    w = e1(torch.relu(e0(te))).view(E, F_NODE, F_NODE)
    msg = torch.einsum("ed,edk->ek", tx[src], w)
    want = _scatter(msg, dst, N, "mean") + tx @ root + bias

    # r4: the edge net is the factored form (same param tree as the MLP it
    # replaced — lin0 Linear + lin1 kernel/bias — so the torch goldens
    # transfer unchanged).
    edge_net = C._EdgeNetFactored(dim3, F_NODE * F_NODE, act="relu")
    params = {
        "edge_net": {"lin0": _lin(e0), "lin1": _lin(e1)},
        "root": jnp.asarray(root.numpy()),
        "bias": jnp.asarray(bias.numpy()),
    }
    got = C.NNConv(dim=F_NODE, edge_net=edge_net).apply(
        {"params": params}, batch.x, batch,
        jnp.asarray(np.pad(eattr, ((0, E_PAD - E), (0, 0)))),
    )
    _close(got[:N], want, atol=2e-5)

    # torch.nn.GRU on a length-1 sequence == the GRUCell used per MPNN layer
    from matdeeplearn_tpu.nn.layers import GRUCell

    gru = torch.nn.GRUCell(F_NODE, F_NODE)
    h = torch.as_tensor(x)
    want_h = gru(torch.as_tensor(want.detach().numpy()), h)
    gp = {
        "w_ih": jnp.asarray(gru.weight_ih.detach().numpy().T),
        "w_hh": jnp.asarray(gru.weight_hh.detach().numpy().T),
        "b_ih": jnp.asarray(gru.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(gru.bias_hh.detach().numpy()),
    }
    got_h = GRUCell(hidden=F_NODE).apply(
        {"params": gp}, jnp.asarray(want.detach().numpy()), jnp.asarray(x)
    )
    _close(got_h, want_h, atol=2e-5)


def test_schnet_interaction_matches_pyg_math():
    x, src, dst, eattr, ew, batch = _toy_graph()
    filters, cutoff = 7, 8.0
    mlp0 = torch.nn.Linear(F_EDGE, filters)
    mlp1 = torch.nn.Linear(filters, filters)
    lin1 = torch.nn.Linear(F_NODE, filters, bias=False)
    lin2 = torch.nn.Linear(filters, F_NODE)
    lin = torch.nn.Linear(F_NODE, F_NODE)
    tx, te = torch.as_tensor(x), torch.as_tensor(eattr)
    tw = torch.as_tensor(ew)

    def ssp(v):
        return torch.nn.functional.softplus(v) - float(np.log(2.0))

    # PyG CFConv: W = mlp(e) * cosine_cutoff(d); h = lin1(x);
    # agg = sum_dst(h_src * W); out = lin(ssp(lin2(agg)))
    cos = 0.5 * (torch.cos(tw * np.pi / cutoff) + 1.0)
    W = mlp1(ssp(mlp0(te))) * cos.unsqueeze(-1)
    h = lin1(tx)
    agg = _scatter(h[src] * W, dst, N, "sum")
    want = lin(ssp(lin2(agg)))

    params = {"mlp0": _lin(mlp0), "mlp1": _lin(mlp1), "lin1": _lin(lin1),
              "lin2": _lin(lin2), "lin": _lin(lin)}
    got = C.SchNetInteraction(dim=F_NODE, filters=filters, cutoff=cutoff).apply(
        {"params": params}, batch.x, batch,
        jnp.asarray(np.pad(eattr, ((0, E_PAD - E), (0, 0)))),
    )
    _close(got[:N], want)


def test_gcnconv_matches_pyg_math():
    x, src, dst, eattr, ew, batch = _toy_graph()
    lin = torch.nn.Linear(F_NODE, DIM, bias=False)
    bias = torch.randn(DIM) * 0.1
    tx, tw = torch.as_tensor(x), torch.as_tensor(ew)
    # PyG gcn_norm (add_self_loops=False): deg = scatter(ew, col);
    # norm = d^-1/2[row] * ew * d^-1/2[col]; out = sum_dst(norm * lin(x)_src) + b
    deg = _scatter(tw.unsqueeze(-1), dst, N, "sum")[:, 0]
    dis = deg.pow(-0.5)
    dis[torch.isinf(dis)] = 0.0
    norm = dis[torch.as_tensor(src, dtype=torch.long)] * tw * dis[
        torch.as_tensor(dst, dtype=torch.long)]
    h = lin(tx)
    want = _scatter(norm.unsqueeze(-1) * h[src], dst, N, "sum") + bias

    params = {"lin": _lin(lin), "bias": jnp.asarray(bias.numpy())}
    got = C.GCNConv(dim=DIM).apply({"params": params}, batch.x, batch)
    _close(got[:N], want)


def test_megnet_block_matches_metalayer_math():
    x, src, dst, eattr, ew, batch = _toy_graph()
    dim, fc_layers = F_NODE, 2
    rng = _rng()
    e_in = rng.standard_normal((E, dim)).astype(np.float32)
    u_in = rng.standard_normal((2, dim)).astype(np.float32)
    node_graph = np.concatenate([np.zeros(N1), np.ones(N2)]).astype(np.int64)

    def make_mlp(d_in):
        lins = [torch.nn.Linear(d_in, dim)] + [
            torch.nn.Linear(dim, dim) for _ in range(fc_layers)
        ]
        return lins

    def run_mlp(lins, v):
        for ln in lins:
            v = torch.relu(ln(v))
        return v

    edge_lins = make_mlp(dim * 3 + F_NODE)  # [x_src || x_dst || e || u]
    node_lins = make_mlp(dim * 2 + F_NODE)
    glob_lins = make_mlp(dim * 3)

    tx, te, tu = map(torch.as_tensor, (x, e_in, u_in))
    eg = node_graph[src]  # MetaLayer passes batch[row] to the edge model
    # Edge model (megnet.py:41-57)
    comb_e = torch.cat([tx[src], tx[dst], te, tu[eg]], dim=1)
    e_out = run_mlp(edge_lins, comb_e)
    # Node model (megnet.py:86-103): edge mean at SOURCE node
    v_e = _scatter(e_out, src, N, "mean")
    comb_v = torch.cat([tx, v_e, tu[node_graph]], dim=1)
    x_out = run_mlp(node_lins, comb_v)
    # Global model (megnet.py:130-147)
    u_e = _scatter(_scatter(e_out, src, N, "mean"), node_graph, 2, "mean")
    u_v = _scatter(tx, node_graph, 2, "mean")
    comb_u = torch.cat([u_e, u_v, tu], dim=1)
    u_out = run_mlp(glob_lins, comb_u)

    def mlp_params(lins):
        return {f"lin{i}": _lin(ln) for i, ln in enumerate(lins)}

    params = {"edge_mlp": mlp_params(edge_lins),
              "node_mlp": mlp_params(node_lins),
              "global_mlp": mlp_params(glob_lins)}
    block = C.MEGNetBlock(dim=dim, fc_layers=fc_layers, act="relu",
                          batch_norm=False)
    # B includes one pad graph slot; u rows for pad slots are zeros.
    gx, ge, gu = block.apply(
        {"params": params},
        batch.x,
        jnp.asarray(np.pad(e_in, ((0, E_PAD - E), (0, 0)))),
        jnp.asarray(np.pad(u_in, ((0, 1), (0, 0)))),
        batch,
    )
    _close(gx[:N], x_out)
    _close(ge[:E], e_out)
    _close(gu[:2], u_out)


def test_set2set_matches_pyg_math():
    x, src, dst, eattr, ew, batch = _toy_graph()
    steps = 3
    lstm = torch.nn.LSTMCell(2 * F_NODE, F_NODE)
    tx = torch.as_tensor(x)
    node_graph = np.concatenate([np.zeros(N1), np.ones(N2)]).astype(np.int64)
    ng = torch.as_tensor(node_graph)

    # PyG Set2Set with torch.nn.LSTM on length-1 sequences == LSTMCell loop
    q_star = torch.zeros(2, 2 * F_NODE)
    h = torch.zeros(2, F_NODE)
    c = torch.zeros(2, F_NODE)
    for _ in range(steps):
        h, c = lstm(q_star, (h, c))
        q = h
        e = (tx * q[ng]).sum(dim=-1, keepdim=True)
        # softmax over nodes within each graph
        emax = torch.full((2, 1), -1e30)
        for i in range(N):
            emax[node_graph[i]] = torch.maximum(emax[node_graph[i]], e[i])
        a = torch.exp(e - emax[ng])
        a = a / _scatter(a, node_graph, 2, "sum")[ng]
        r = _scatter(a * tx, node_graph, 2, "sum")
        q_star = torch.cat([q, r], dim=1)

    params = {"lstm": {
        "w_ih": jnp.asarray(lstm.weight_ih.detach().numpy().T),
        "w_hh": jnp.asarray(lstm.weight_hh.detach().numpy().T),
        "b_ih": jnp.asarray(lstm.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(lstm.bias_hh.detach().numpy()),
    }}
    got = Set2Set(dim=F_NODE, processing_steps=steps).apply(
        {"params": params}, batch.x, batch.node_graph, batch.node_mask, 2
    )
    _close(got[:2], q_star, atol=2e-5)
