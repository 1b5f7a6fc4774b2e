"""Fused CGConv Pallas kernel: message MLP + edge basis + aggregation in one
MXU pass over the windowed edge layout.

KERNELS.md's r2 verdict traced the plain windowed kernel's end-to-end loss
to two structural costs: (a) the windowed layout's extra pad edge slots run
through every conv MLP *outside* the kernel, and (b) the opaque pallas_call
boundary stops XLA from scheduling the aggregation against the MLPs. Both
point at the same fix — move the message computation *into* the kernel.
This module does that for CGConv (the flagship/bench operator,
reference models/cgcnn.py:80-82):

  per edge tile (TE edges of window w, all resident in VMEM):
    xi    = onehot(dst-w·TW) @ x_window          (MXU gather)
    e     = exp(coeff·(dist-μ_k)²)               (VPU, Gaussian edge basis)
    a_f   = xi·Wfi + xj·Wfj + e·Wfe + bf         (MXU — the FLOP-dominant
    a_s   = xi·Wsi + xj·Wsj + e·Wse + bs          message MLPs)
    msg   = σ(a_f) ⊙ softplus(a_s)
    out_w += onehotᵀ @ msg                       (MXU aggregation)

so the (E, 2D+De) z-matrix, the gate/core activations and the messages
never exist in HBM: per conv layer HBM traffic is x, x[src], dist read once
and the (N, D) output written once. The backward is a second Pallas kernel
over the same tiles that *recomputes* the activations (flash-attention
style rematerialization) and produces d_x (window-accumulated), d_xj
(per-tile) and all weight/bias gradients (constant-index accumulator
blocks) in one pass.

Weight layout: CGConv's lin_f/lin_s kernels (2D+De, D) split by z-block
rows into (Wfi, Wfj, Wfe) so no concat is ever materialized.

Reference role replaced: PyG CGConv + torch_scatter in one op
(models/cgcnn.py:80-87; SURVEY §2.3 "torch_scatter-transcending" row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from matdeeplearn_tpu.ops.pallas_segment import (
    WindowedEdges,
    _hilo,
    _out_struct,
    round_up,
)


def _edge_basis_tile(dist, te, de, width):
    """In-kernel Gaussian basis: (TE,1) distances → (TE,De) features.
    Exact ops/edge_basis.py numerics (reference process.py:583-590)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (te, de), 1).astype(jnp.float32)
    offsets = k * (1.0 / (de - 1))
    coeff = -0.5 / (width * width)
    diff = dist - offsets  # (TE, De) via broadcast of (TE, 1)
    return jnp.exp(coeff * diff * diff)


def _acc(out_ref, onehot, msg, hilo):
    """out += onehotᵀ @ msg with optional f32-accurate hi/lo split."""
    dn = (((0,), (0,)), ((), ()))
    if hilo:
        hi, lo = _hilo(msg)
        out_ref[:] += jax.lax.dot_general(
            onehot, hi, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            onehot, lo, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
    else:
        out_ref[:] += jax.lax.dot_general(
            onehot, msg, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )


def _gather_win(onehot, win_ref, hilo):
    """onehot @ window_block — the in-window gather (xi or g[dst])."""
    if hilo:
        hi, lo = _hilo(win_ref[:])
        return (
            jnp.dot(onehot, hi, preferred_element_type=jnp.float32)
            + jnp.dot(onehot, lo, preferred_element_type=jnp.float32)
        )
    return jnp.dot(onehot, win_ref[:], preferred_element_type=jnp.float32)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mm_t(a, b):
    """a @ bᵀ."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_tl(a, b):
    """aᵀ @ b."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(wid_ref, first_ref, dst_ref, dist_ref, xj_ref, xwin_ref,
                wfi_ref, wfj_ref, wfe_ref, bf_ref,
                wsi_ref, wsj_ref, wse_ref, bs_ref,
                out_ref, *, tw, te, de, width, hilo):
    t = pl.program_id(0)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    local = dst_ref[:] - wid_ref[t] * tw                  # (TE, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (te, tw), 1)
    onehot = (local == rows).astype(jnp.float32)          # (TE, TW)

    xi = _gather_win(onehot, xwin_ref, hilo)              # (TE, D)
    e = _edge_basis_tile(dist_ref[:], te, de, width)      # (TE, De)
    xj = xj_ref[:]
    af = (_mm(xi, wfi_ref[:]) + _mm(xj, wfj_ref[:])
          + _mm(e, wfe_ref[:]) + bf_ref[0, :][None, :])
    as_ = (_mm(xi, wsi_ref[:]) + _mm(xj, wsj_ref[:])
           + _mm(e, wse_ref[:]) + bs_ref[0, :][None, :])
    msg = jax.nn.sigmoid(af) * jax.nn.softplus(as_)
    _acc(out_ref, onehot, msg, hilo)


def _bwd_kernel(wid_ref, first_ref, dst_ref, dist_ref, xj_ref, xwin_ref,
                gwin_ref,
                wfi_ref, wfj_ref, wfe_ref, bf_ref,
                wsi_ref, wsj_ref, wse_ref, bs_ref,
                dxwin_ref, dxj_ref, dwfi_ref, dwfj_ref, dwfe_ref, dbf_ref,
                dwsi_ref, dwsj_ref, dwse_ref, dbs_ref,
                *, tw, te, de, width, hilo):
    t = pl.program_id(0)

    @pl.when(first_ref[t] == 1)
    def _():
        dxwin_ref[:] = jnp.zeros_like(dxwin_ref)

    @pl.when(t == 0)
    def _():
        dwfi_ref[:] = jnp.zeros_like(dwfi_ref)
        dwfj_ref[:] = jnp.zeros_like(dwfj_ref)
        dwfe_ref[:] = jnp.zeros_like(dwfe_ref)
        dbf_ref[:] = jnp.zeros_like(dbf_ref)
        dwsi_ref[:] = jnp.zeros_like(dwsi_ref)
        dwsj_ref[:] = jnp.zeros_like(dwsj_ref)
        dwse_ref[:] = jnp.zeros_like(dwse_ref)
        dbs_ref[:] = jnp.zeros_like(dbs_ref)

    local = dst_ref[:] - wid_ref[t] * tw
    rows = jax.lax.broadcasted_iota(jnp.int32, (te, tw), 1)
    onehot = (local == rows).astype(jnp.float32)

    # Rematerialize the forward activations for this tile.
    xi = _gather_win(onehot, xwin_ref, hilo)
    e = _edge_basis_tile(dist_ref[:], te, de, width)
    xj = xj_ref[:]
    af = (_mm(xi, wfi_ref[:]) + _mm(xj, wfj_ref[:])
          + _mm(e, wfe_ref[:]) + bf_ref[0, :][None, :])
    as_ = (_mm(xi, wsi_ref[:]) + _mm(xj, wsj_ref[:])
           + _mm(e, wse_ref[:]) + bs_ref[0, :][None, :])
    gate = jax.nn.sigmoid(af)
    core = jax.nn.softplus(as_)

    # gg[e] = g[dst[e]] — in-window gather of the output cotangent.
    gg = _gather_win(onehot, gwin_ref, hilo)              # (TE, D)
    d_af = gg * core * gate * (1.0 - gate)                # σ' = σ(1-σ)
    d_as = gg * gate * jax.nn.sigmoid(as_)                # softplus' = σ

    d_xi = _mm_t(d_af, wfi_ref[:]) + _mm_t(d_as, wsi_ref[:])
    dxj_ref[:] = _mm_t(d_af, wfj_ref[:]) + _mm_t(d_as, wsj_ref[:])
    _acc(dxwin_ref, onehot, d_xi, hilo)

    dwfi_ref[:] += _mm_tl(xi, d_af)
    dwfj_ref[:] += _mm_tl(xj, d_af)
    dwfe_ref[:] += _mm_tl(e, d_af)
    dbf_ref[0, :] += jnp.sum(d_af, axis=0)
    dwsi_ref[:] += _mm_tl(xi, d_as)
    dwsj_ref[:] += _mm_tl(xj, d_as)
    dwse_ref[:] += _mm_tl(e, d_as)
    dbs_ref[0, :] += jnp.sum(d_as, axis=0)


def _reference_compose(x, xj, dist, we: WindowedEdges, params, num_nodes,
                       de, width):
    """Pure-XLA composition with identical semantics — the numerical oracle
    for the kernels and the interpret-mode fallback inside manual shard_map
    regions (same jax-0.9 lowering-cache caveat as ops/aggregate.py)."""
    from matdeeplearn_tpu.ops import segment
    from matdeeplearn_tpu.ops.edge_basis import gaussian_basis

    wfi, wfj, wfe, bf, wsi, wsj, wse, bs = params
    xi = x[jnp.maximum(we.dst, 0)] * we.valid[:, None]
    e = gaussian_basis(dist, 0.0, 1.0, de, width)
    af = xi @ wfi + xj @ wfj + e @ wfe + bf
    as_ = xi @ wsi + xj @ wsj + e @ wse + bs
    msg = jax.nn.sigmoid(af) * jax.nn.softplus(as_)
    return segment.segment_sum(
        msg, jnp.maximum(we.dst, 0), num_segments=num_nodes, mask=we.valid
    )


def _visited_nodes(we: WindowedEdges, n_pad: int, tw: int):
    """(n_pad,) 1.0 on nodes whose window some tile actually visits.

    Window-indexed kernel outputs are only zeroed by their window's
    first_tile; windows no tile visits (pad node region, or an all-pad
    batch where every tile is parked with first=0) keep uninitialized HBM
    garbage and MUST be masked out of both the forward aggregation and the
    backward d_x."""
    nw = n_pad // tw
    visited = (
        jnp.zeros((nw,), jnp.float32)
        .at[we.window_id]
        .add(we.first_tile.astype(jnp.float32), mode="drop")
    )
    return jnp.repeat((visited > 0).astype(jnp.float32), tw)


def _fwd_impl(cfg, x, xj, dist, we: WindowedEdges, *params):
    num_nodes, tw, te, de, width, interpret, hilo = cfg
    in_manual = bool(getattr(jax.typeof(x), "vma", frozenset()))
    if interpret and in_manual:
        return _reference_compose(x, xj, dist, we, params, num_nodes, de,
                                  width)
    ew, d = xj.shape
    t = ew // te
    n_pad = round_up(num_nodes, tw)
    if n_pad != x.shape[0]:
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    wfi, wfj, wfe, bf, wsi, wsj, wse, bs = params
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((te, 1), lambda i, wid, first: (i, 0)),
            pl.BlockSpec((te, 1), lambda i, wid, first: (i, 0)),
            pl.BlockSpec((te, d), lambda i, wid, first: (i, 0)),
            pl.BlockSpec((tw, d), lambda i, wid, first: (wid[i], 0)),
        ] + [
            pl.BlockSpec(p.shape, lambda i, wid, first: (0, 0))
            for p in params
        ],
        out_specs=pl.BlockSpec((tw, d), lambda i, wid, first: (wid[i], 0)),
    )
    out = pl.pallas_call(
        partial(_fwd_kernel, tw=tw, te=te, de=de, width=width, hilo=hilo),
        out_shape=_out_struct((n_pad, d), x, xj, dist, we.dst, we.window_id),
        grid_spec=grid_spec,
        interpret=interpret,
    )(we.window_id, we.first_tile, we.dst[:, None], dist[:, None], xj, x,
      *params)
    # where, not multiply: unvisited-window garbage can be inf/NaN and
    # NaN*0 stays NaN.
    vis = _visited_nodes(we, n_pad, tw)[:, None] > 0
    return jnp.where(vis, out, 0.0)[:num_nodes]


def _bwd_impl(cfg, x, xj, dist, we: WindowedEdges, params, g):
    num_nodes, tw, te, de, width, interpret, hilo = cfg
    ew, d = xj.shape
    t = ew // te
    n_pad = round_up(num_nodes, tw)
    if n_pad != x.shape[0]:
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    if n_pad != g.shape[0]:
        g = jnp.pad(g, ((0, n_pad - g.shape[0]), (0, 0)))
    wfi, wfj, wfe, bf, wsi, wsj, wse, bs = params
    tile_spec = [
        pl.BlockSpec((te, 1), lambda i, wid, first: (i, 0)),
        pl.BlockSpec((te, 1), lambda i, wid, first: (i, 0)),
        pl.BlockSpec((te, d), lambda i, wid, first: (i, 0)),
        pl.BlockSpec((tw, d), lambda i, wid, first: (wid[i], 0)),
        pl.BlockSpec((tw, d), lambda i, wid, first: (wid[i], 0)),
    ] + [
        pl.BlockSpec(p.shape, lambda i, wid, first: (0, 0)) for p in params
    ]
    const = lambda shape: pl.BlockSpec(shape, lambda i, wid, first: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=tile_spec,
        out_specs=[
            pl.BlockSpec((tw, d), lambda i, wid, first: (wid[i], 0)),
            pl.BlockSpec((te, d), lambda i, wid, first: (i, 0)),
            const(wfi.shape), const(wfj.shape), const(wfe.shape),
            const(bf.shape),
            const(wsi.shape), const(wsj.shape), const(wse.shape),
            const(bs.shape),
        ],
    )
    shapes = [
        _out_struct((n_pad, d), x, g, we.dst),
        _out_struct((ew, d), xj, g, we.dst),
    ] + [_out_struct(p.shape, p, g) for p in params]
    outs = pl.pallas_call(
        partial(_bwd_kernel, tw=tw, te=te, de=de, width=width, hilo=hilo),
        out_shape=tuple(shapes),
        grid_spec=grid_spec,
        interpret=interpret,
    )(we.window_id, we.first_tile, we.dst[:, None], dist[:, None], xj, x, g,
      *params)
    vis = _visited_nodes(we, n_pad, tw)[:, None] > 0
    d_x = jnp.where(vis, outs[0], 0.0)[:num_nodes]
    d_xj = outs[1]
    return (d_x, d_xj) + tuple(outs[2:])


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_cgconv(cfg, x, xj, dist, we: WindowedEdges,
                 wfi, wfj, wfe, bf, wsi, wsj, wse, bs):
    """Σ_{e: dst[e]==n} σ(z·Wf+bf) ⊙ softplus(z·Ws+bs), z = [x_dst‖x_src‖e]
    over the windowed layout, message MLPs fused into the aggregation.

    cfg = (num_nodes, tw, te, edge_resolution, edge_width, interpret, hilo)
    x: (N, D) node features; xj: (EW, D) pre-gathered x[src] in windowed
    order; dist: (EW,) normalized distances. Returns the SUM aggregation
    (N, D) — callers divide by true in-degree for CGConv's aggr="mean".

    `dist` is treated as NON-DIFFERENTIABLE data: the VJP returns zero for
    it even though the output depends on dist through the in-kernel
    Gaussian basis (energy training never differentiates w.r.t. distances).
    Force/position-gradient work must not route through this kernel
    without first adding the basis-derivative term to _bwd_kernel.
    """
    return _fwd_impl(cfg, x, xj, dist, we, wfi, wfj, wfe, bf,
                     wsi, wsj, wse, bs)


def _fc_fwd(cfg, x, xj, dist, we, wfi, wfj, wfe, bf, wsi, wsj, wse, bs):
    out = _fwd_impl(cfg, x, xj, dist, we, wfi, wfj, wfe, bf,
                    wsi, wsj, wse, bs)
    return out, (x, xj, dist, we, (wfi, wfj, wfe, bf, wsi, wsj, wse, bs))


def _fc_bwd(cfg, res, g):
    x, xj, dist, we, params = res
    interpret = cfg[5]
    in_manual = bool(getattr(jax.typeof(x), "vma", frozenset()))
    if interpret and in_manual:
        # Interpret+manual fallback mirrors the forward: differentiate the
        # XLA composition directly.
        num_nodes, _, _, de, width, _, _ = cfg

        def f(x_, xj_, *p):
            return _reference_compose(x_, xj_, dist, we, p, num_nodes, de,
                                      width)

        _, vjp = jax.vjp(f, x, xj, *params)
        grads = vjp(g)
        return (grads[0], grads[1], jnp.zeros_like(dist), None) + tuple(
            grads[2:]
        )
    grads = _bwd_impl(cfg, x, xj, dist, we, params, g)
    return (grads[0], grads[1], jnp.zeros_like(dist), None) + tuple(grads[2:])


fused_cgconv.defvjp(_fc_fwd, _fc_bwd)
