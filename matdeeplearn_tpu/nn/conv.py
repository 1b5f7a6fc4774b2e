"""Graph convolution primitives, re-derived from the PyG math the reference
uses — not ported. Each layer operates on the static-shape padded batch
(data/batching.py) with explicit masks; edge→node aggregation dispatches to
the CSR sorted segment kernels, the Pallas windowed MXU kernel or masked
XLA segment ops per the resolved kernel mode (ops/aggregate.py).

Reference operators being matched:
  * CGConv            (models/cgcnn.py:80-82; PyG gated crystal-graph conv)
  * NNConv            (models/mpnn.py:83-88; edge-conditioned weight matrix)
  * SchNet interaction(models/schnet.py:81; PyG InteractionBlock/CFConv)
  * GCNConv           (models/gcn.py:80-82; improved=True, add_self_loops=False)
  * MEGNet block      (models/megnet.py:16-147; MetaLayer edge/node/global)

Message-passing directions follow PyG source_to_target flow: an edge
(src=edge_index[0], dst=edge_index[1]) carries a message from src that is
aggregated at dst. Degree/one-hot features in the reference count edge_index[0].
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from matdeeplearn_tpu.nn.layers import (
    Linear,
    MaskedBatchNorm,
    get_activation,
    shifted_softplus,
    xavier_uniform,
)
from matdeeplearn_tpu.ops import segment
from matdeeplearn_tpu.ops.aggregate import (
    edge_aggregate,
    edge_segment_mean,
    gather_dst,
    gather_src,
    src_segment_mean,
)


class _LinearParams(nn.Module):
    """Declares Linear's exact parameter tree (kernel+bias, same init, same
    scope path) without running the dense op — the fused kernels consume
    the raw matrices, so checkpoints/golden tests stay identical across
    kernel modes."""

    features: int
    fan_in: int
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self):
        from matdeeplearn_tpu.nn.layers import torch_linear_init

        default = torch_linear_init(self.fan_in)
        k = self.param("kernel", self.kernel_init or default,
                       (self.fan_in, self.features))
        b = self.param("bias", self.bias_init or default, (self.features,))
        return k, b


class CGConv(nn.Module):
    """Crystal-graph conv: out_i = x_i + mean_{j→i} σ(W_f z) ⊙ softplus(W_s z),
    z = [x_i ‖ x_j ‖ e_ij]. aggr="mean", no internal BN (cgcnn.py:80-82).

    kernel="fused" (batch.kernel_fused on a windowed batch): the gate/core
    MLPs, the Gaussian edge basis and the aggregation run as ONE Pallas MXU
    kernel (ops/pallas_fused.py) — z, gate, core and the messages never
    exist in HBM, and the windowed layout's pad edge slots never reach an
    XLA-level MLP (the r2 KERNELS.md fix)."""

    dim: int
    edge_width: float = 0.2

    @nn.compact
    def __call__(self, x, batch, edge_attr):
        if batch.is_windowed and batch.kernel_fused:
            from matdeeplearn_tpu.ops import pallas_fused as PF
            from matdeeplearn_tpu.ops.pallas_segment import WindowedEdges

            d = self.dim
            de = edge_attr.shape[-1]
            din = 2 * d + de
            kf, bf = _LinearParams(d, din, name="lin_f")()
            ks, bs = _LinearParams(d, din, name="lin_s")()
            # z = [x_i ‖ x_j ‖ e] → row blocks of the weight matrices
            wfi, wfj, wfe = kf[:d], kf[d:2 * d], kf[2 * d:]
            wsi, wsj, wse = ks[:d], ks[d:2 * d], ks[2 * d:]
            dt = x.dtype
            xf = x.astype(jnp.float32)
            xj = xf[batch.edge_src]
            te = batch.num_edges // batch.tile_window.shape[0]
            we = WindowedEdges(
                order=batch.edge_dst, dst=batch.edge_dst,
                window_id=batch.tile_window, first_tile=batch.tile_first,
                valid=batch.edge_mask,
            )
            interpret = jax.default_backend() != "tpu"
            cfg = (batch.num_nodes, batch.window_size, te, de,
                   self.edge_width, interpret, not batch.kernel_bf16)
            agg = PF.fused_cgconv(
                cfg, xf, xj, batch.edge_dist_norm, we,
                wfi, wfj, wfe, bf[None, :], wsi, wsj, wse, bs[None, :],
            )
            agg = jnp.where(batch.node_mask[:, None] > 0, agg, 0.0)
            agg = agg / jnp.maximum(batch.in_degree, 1.0)[:, None]
            return x + agg.astype(dt)

        z = jnp.concatenate(
            [gather_dst(x, batch), gather_src(x, batch), edge_attr], axis=-1
        )  # [x_i, x_j, e] — PyG CGConv concat order (each side rides the
        # CSR sorted-gather kernel when the batch is sorted by it)
        gate = jax.nn.sigmoid(Linear(self.dim, name="lin_f")(z))
        core = jax.nn.softplus(Linear(self.dim, name="lin_s")(z))
        agg = edge_aggregate(gate * core, batch, reduce="mean")
        return x + agg


class _EdgeNetFactored(nn.Module):
    """MPNN's edge network with the second layer's weights exposed raw:
    returns (a, W1, b1) where a = act(e @ W0 + b0). Parameter tree is
    IDENTICAL to the MLP it replaces (lin0 Linear + lin1 kernel/bias, same
    torch init) so checkpoints/goldens are unchanged; the unfused path
    recovers w_e = a @ W1 + b1 exactly."""

    hidden: int
    dout: int  # D * K
    act: str = "relu"

    @nn.compact
    def __call__(self, e):
        a = get_activation(self.act)(Linear(self.hidden, name="lin0")(e))
        kw, kb = _LinearParams(self.dout, self.hidden, name="lin1")()
        return a, kw, kb


class NNConv(nn.Module):
    """Edge-conditioned conv (MPNN): out_i = x_i W_root + mean_{j→i} x_j W(e_ij)
    with W(e) an `edge_nn`-produced (din, dout) matrix per edge, aggr="mean"
    (mpnn.py:83-88). Root weight U(-1/√in, 1/√in), bias zeros (PyG reset).

    fused=True routes the bilinear message through the Pallas VMEM kernel
    (ops/pallas_bilinear.py): the (E, D, K) per-edge weight tensor never
    exists in HBM — measured ×2.0 over the XLA einsum at bulk scale on
    v5e. Works with ANY batching (no windowed layout needed)."""

    dim: int
    edge_net: nn.Module
    fused: bool = False
    edge_tile: int = 512

    @nn.compact
    def __call__(self, x, batch, edge_attr):
        din = x.shape[-1]
        a, kw, kb = self.edge_net(edge_attr)
        xj = gather_src(x, batch)
        if self.fused:
            from matdeeplearn_tpu.ops.pallas_bilinear import (
                fused_bilinear_msg,
            )

            interpret = jax.default_backend() != "tpu"
            # Kernel MXU precision follows the model's precision mode:
            # bf16 activations → single-pass bf16 MXU operands inside the
            # kernel (f32 accumulation), matching what XLA's einsum would
            # do under `precision: bf16`.
            mxu_bf16 = x.dtype == jnp.bfloat16
            msg = fused_bilinear_msg(
                (self.edge_tile, interpret, mxu_bf16),
                xj.astype(jnp.float32), a.astype(jnp.float32),
                kw.astype(jnp.float32), kb.astype(jnp.float32),
            ).astype(x.dtype)
        else:
            w_e = (a @ kw.astype(a.dtype)
                   + kb.astype(a.dtype)).reshape(-1, din, self.dim)
            msg = jnp.einsum(
                "ed,edk->ek", xj, w_e,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        agg = edge_aggregate(msg, batch, reduce="mean")
        bound = 1.0 / (din ** 0.5)
        root = self.param(
            "root",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (din, self.dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        rootx = jnp.dot(
            x, root.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return agg + rootx + bias.astype(x.dtype)


class SchNetInteraction(nn.Module):
    """PyG schnet.InteractionBlock: cfconv (filter-generating MLP on edge_attr
    × cosine cutoff on raw edge_weight, sum aggregation) → shifted-softplus →
    linear (schnet.py:81; PyG models/schnet.py). Xavier-uniform init."""

    dim: int        # node feature width (gc_dim)
    filters: int    # num_filters (dim3)
    cutoff: float
    edge_width: float = 0.2

    @nn.compact
    def __call__(self, x, batch, edge_attr):
        if batch.is_windowed and batch.kernel_fused:
            # Fused cfconv (ops/pallas_fused_schnet.py): filter MLP +
            # Gaussian basis + cosine cutoff + sum aggregation in one MXU
            # kernel — the (E, F) filters and messages never hit HBM.
            # Identical parameter tree to the XLA path below.
            from matdeeplearn_tpu.ops import pallas_fused_schnet as PFS
            from matdeeplearn_tpu.ops.pallas_segment import WindowedEdges

            de = edge_attr.shape[-1]
            w0, b0 = _LinearParams(self.filters, de,
                                   kernel_init=xavier_uniform(),
                                   bias_init=nn.initializers.zeros,
                                   name="mlp0")()
            w1, b1 = _LinearParams(self.filters, self.filters,
                                   kernel_init=xavier_uniform(),
                                   bias_init=nn.initializers.zeros,
                                   name="mlp1")()
            dt = x.dtype
            h = Linear(self.filters, use_bias=False,
                       kernel_init=xavier_uniform(), name="lin1")(x)
            xj = gather_src(h.astype(jnp.float32), batch)
            te = batch.num_edges // batch.tile_window.shape[0]
            we = WindowedEdges(
                order=batch.edge_dst, dst=batch.edge_dst,
                window_id=batch.tile_window, first_tile=batch.tile_first,
                valid=batch.edge_mask,
            )
            interpret = jax.default_backend() != "tpu"
            cfg = (batch.num_nodes, batch.window_size, te, de,
                   self.edge_width, self.cutoff, interpret,
                   not batch.kernel_bf16)
            agg = PFS.fused_cfconv(
                cfg, xj, batch.edge_dist_norm, batch.edge_weight, we,
                w0, b0[None, :], w1, b1[None, :],
            )
            agg = jnp.where(batch.node_mask[:, None] > 0, agg, 0.0)
            out = Linear(self.dim, kernel_init=xavier_uniform(),
                         bias_init=nn.initializers.zeros,
                         name="lin2")(agg.astype(dt))
            out = shifted_softplus(out)
            return Linear(self.dim, kernel_init=xavier_uniform(),
                          bias_init=nn.initializers.zeros, name="lin")(out)

        w = Linear(self.filters, kernel_init=xavier_uniform(),
                   bias_init=nn.initializers.zeros, name="mlp0")(edge_attr)
        w = shifted_softplus(w)
        w = Linear(self.filters, kernel_init=xavier_uniform(),
                   bias_init=nn.initializers.zeros, name="mlp1")(w)
        c = 0.5 * (jnp.cos(batch.edge_weight * jnp.pi / self.cutoff) + 1.0)
        w = w * (c * batch.edge_mask).astype(w.dtype)[:, None]

        h = Linear(self.filters, use_bias=False, kernel_init=xavier_uniform(),
                   name="lin1")(x)
        msg = gather_src(h, batch) * w
        agg = edge_aggregate(msg, batch, reduce="sum")
        out = Linear(self.dim, kernel_init=xavier_uniform(),
                     bias_init=nn.initializers.zeros, name="lin2")(agg)
        out = shifted_softplus(out)
        out = Linear(self.dim, kernel_init=xavier_uniform(),
                     bias_init=nn.initializers.zeros, name="lin")(out)
        return out


class GCNConv(nn.Module):
    """GCN with edge weights: out = D^-1/2 Â D^-1/2 X W + b, deg from
    edge_weight summed at dst. The reference sets add_self_loops=False (the
    graph already carries zero-weight self-loops) so improved=True is inert
    (gcn.py:80-82). Glorot weight, zero bias (PyG GCNConv init)."""

    dim: int

    @nn.compact
    def __call__(self, x, batch):
        n = x.shape[0]
        ew = batch.edge_weight * batch.edge_mask
        deg = edge_aggregate(ew[:, None], batch, reduce="sum")[:, 0]
        dis = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-30)), 0.0)
        h = Linear(self.dim, use_bias=False, kernel_init=xavier_uniform(),
                   name="lin")(x)
        # D^-1/2 Â D^-1/2 algebraically reassociated to NODE space:
        #   out_i = dis_i · Σ_{j→i} ew · (dis_j · h_j)
        # pre-scale h by dis (one N-row elementwise), aggregate with the
        # per-edge ew only, post-scale by dis — this removes BOTH per-edge
        # D=1 dis gathers (dis[src], dis[dst]: latency-bound random-row
        # reads the CSR kernels don't cover at D=1). Same math, fp-reorder
        # class difference only. The windowed path still folds ew into the
        # SpMM kernel's VPU (ops/pallas_segment.py:windowed_spmm); degree
        # math stays f32; weights cast inside edge_aggregate.
        hd = h * dis[:, None].astype(h.dtype)
        out = edge_aggregate(gather_src(hd, batch), batch, reduce="sum",
                             weights=ew)
        out = out * dis[:, None].astype(out.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return out + bias.astype(out.dtype)


class MEGNetMLP(nn.Module):
    """MEGNet sub-MLP: (fc_layers+1) × [Linear → act → BN? → dropout]
    — activation before BatchNorm, matching megnet.py:43-55."""

    dim: int
    layers: int  # fc_layers; total linears = layers + 1
    act: str = "relu"
    batch_norm: bool = True
    track_stats: bool = True
    dropout_rate: float = 0.0
    # Mesh axis for cross-shard BN statistics (ring-ep edge MLP): keeps
    # edge-feature BN full-batch when each device holds 1/ep of the edges.
    stat_axis: str | None = None

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        fn = get_activation(self.act)
        for i in range(self.layers + 1):
            x = Linear(self.dim, name=f"lin{i}")(x)
            x = fn(x)
            if self.batch_norm:
                x = MaskedBatchNorm(track_stats=self.track_stats,
                                    axis_name=self.stat_axis,
                                    name=f"bn{i}")(
                    x, mask=mask, use_running_average=not training
                )
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return x


class MEGNetBlock(nn.Module):
    """One MetaLayer step (megnet.py:16-147):
      e' = φ_e([x_src ‖ x_dst ‖ e ‖ u[g(src)]])
      x' = φ_v([x ‖ mean_{e out of i} e' ‖ u[g(i)]])
      u' = φ_u([mean_g mean_{src} e' ‖ mean_g x ‖ u])
    Means aggregate edge features at the *source* node (megnet.py:86,130),
    then nodes per graph — source-side aggregation stays on the XLA path.
    """

    dim: int
    fc_layers: int
    act: str = "relu"
    batch_norm: bool = True
    track_stats: bool = True
    dropout_rate: float = 0.0
    # Under manual ring-ep: psum edge-MLP BN statistics over this axis so
    # training semantics match ep=1 exactly (node/global MLPs see replicated
    # rows across ep members — their local stats are already full-batch).
    ep_axis: str | None = None

    @nn.compact
    def __call__(self, x, e, u, batch, training: bool = False):
        n = x.shape[0]
        num_graphs = batch.num_graphs
        mlp = dict(
            dim=self.dim, layers=self.fc_layers, act=self.act,
            batch_norm=self.batch_norm, track_stats=self.track_stats,
            dropout_rate=self.dropout_rate,
        )
        edge_src = batch.edge_src
        edge_graph = batch.node_graph[edge_src]
        node_graph = batch.node_graph

        # under edge_order "src" (MEGNet's csr layout) x[src], the u
        # broadcast (edge_graph = node_graph[src] is then sorted) and the
        # edge→node means below all ride the CSR kernels; under "dst"
        # only gather_dst does (the helpers fall back per side).
        from matdeeplearn_tpu.ops.aggregate import gather_edge_graph

        comb_e = jnp.concatenate(
            [gather_src(x, batch), gather_dst(x, batch), e,
             gather_edge_graph(u, edge_graph, batch, num_graphs)],
            axis=-1,
        )
        e_out = MEGNetMLP(**mlp, stat_axis=self.ep_axis, name="edge_mlp")(
            comb_e, mask=batch.edge_mask, training=training
        )

        v_e = src_segment_mean(e_out, batch)
        comb_v = jnp.concatenate(
            [x, v_e, u[jnp.minimum(node_graph, num_graphs - 1)]], axis=-1
        )
        x_out = MEGNetMLP(**mlp, name="node_mlp")(
            comb_v, mask=batch.node_mask, training=training
        )

        # u's edge mean reuses v_e (identical value; an opaque pallas_call
        # is not CSE'd by XLA, so recomputing it would run the CSR kernel
        # twice per block on the src-sorted path).
        # node→graph means stay on XLA segment ops by measurement (the
        # CSR pool is e2e-neutral here; see nn/pool.py:global_mean_pool)
        u_e = segment.segment_mean(
            v_e, node_graph, num_segments=num_graphs + 1, mask=batch.node_mask
        )[:num_graphs]
        u_v = segment.segment_mean(
            x, node_graph, num_segments=num_graphs + 1, mask=batch.node_mask
        )[:num_graphs]
        comb_u = jnp.concatenate([u_e, u_v, u], axis=-1)
        u_out = MEGNetMLP(**mlp, name="global_mlp")(
            comb_u, mask=batch.graph_mask, training=training
        )
        return x_out, e_out, u_out
