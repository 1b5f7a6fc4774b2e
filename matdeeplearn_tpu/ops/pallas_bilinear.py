"""Fused NNConv bilinear-message Pallas kernel.

MPNN's NNConv (reference models/mpnn.py:83-88) computes per edge

    W(e) = edge_net(e_attr) ∈ R^{D×K}   (a 2-layer MLP's output, reshaped)
    msg  = x_src @ W(e)

The FLOP-heaviest operator in the reference zoo — and on TPU the XLA
lowering is HBM-bound, not FLOP-bound: the (E, D, K) per-edge weight
tensor (4.8 GB at bulk scale, D=K=100) materializes in HBM and the
batched per-edge matvec runs at ~2% MFU (measured 91 ms fwd+bwd per conv
layer at E=120k; the factored einsum reassociation only reaches 79 ms
because it materializes an equally-large (E, H, K) intermediate).

This kernel keeps the bilinear contraction entirely in VMEM. With
a = relu(e_attr @ W0 + b0) (computed in XLA — it is only (E, H)) and the
second layer's weights W1 ∈ R^{H×(D·K)}:

    msg_e = Σ_h a_e[h] · (x_e @ W1[h]) + x_e @ b1            (per edge)

per tile of TE edges, loop h: one (TE, D) @ (D, K) MXU matmul scaled by
the a-column — the (D, K) weight slice streams from a resident 4 MB VMEM
block and NO edge-indexed D×K tensor ever exists in HBM. HBM traffic per
layer drops from ~10 GB to ~100 MB (xj, a, msg and grads only).

The backward rematerializes nothing (all inputs are small); one kernel
pass produces d_xj, d_a and the accumulated d_W1 / d_b1 (constant-index
accumulator blocks, like ops/pallas_fused.py's weight grads).

Unlike the windowed kernels this one needs NO special edge layout — it
tiles the flat edge dimension, so it composes with padded, packed and
windowed batching alike; aggregation stays on the XLA scatter path
(aggregation is not MPNN's bottleneck).

Reference role replaced: torch_geometric NNConv's per-edge weight matmul
(torch_scatter/PyG CUDA path; SURVEY §2.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _cast(x, mxu_bf16):
    # mxu_bf16=True feeds the MXU single-pass bf16 operands (f32
    # accumulation via preferred_element_type) instead of the multi-pass
    # f32 product — the kernel-internal half of `precision: bf16`.
    return x.astype(jnp.bfloat16) if mxu_bf16 else x


def _fwd_kernel(xj_ref, a_ref, w1_ref, b1_ref, out_ref, *, te, d, h, k,
                mxu_bf16=False):
    xj = _cast(xj_ref[:], mxu_bf16)      # (TE, D)
    a = a_ref[:]                         # (TE, H)
    acc = _mm(xj, _cast(b1_ref[:], mxu_bf16))  # (TE, K) — bias term
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)

    def body(i, acc):
        w = w1_ref[pl.ds(i, 1), :, :].reshape(d, k)  # squeeze leading 1
        # column i of `a` via an iota mask — Mosaic forbids dynamic
        # lane-dimension slices; the masked reduce is ~TE·H VPU ops, noise
        # next to the (TE,D)@(D,K) MXU matmul.
        ai = jnp.sum(a * (cols == i).astype(jnp.float32), axis=1,
                     keepdims=True)                          # (TE, 1)
        return acc + ai * _mm(xj, _cast(w, mxu_bf16))

    acc = jax.lax.fori_loop(0, h, body, acc)
    out_ref[:] = acc


def _bwd_kernel(xj_ref, a_ref, w1_ref, g_ref,
                dxj_ref, da_ref, dw1_ref, db1_ref, *, te, d, h, k,
                mxu_bf16=False):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)

    xj = _cast(xj_ref[:], mxu_bf16)
    g = g_ref[:]                          # (TE, K) cotangent of msg
    g16 = _cast(g, mxu_bf16)
    db1_ref[:] += jax.lax.dot_general(
        xj, g16, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # d_xj's bias term (g @ b1ᵀ) is added in XLA by the VJP wrapper so b1
    # need not be a kernel input; here only the W1 part accumulates.
    a = a_ref[:]                         # (TE, H)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)
    dxj0 = jnp.zeros((te, d), jnp.float32)
    da0 = jnp.zeros((te, h), jnp.float32)

    def body(i, carry):
        dxj, da = carry
        sel = (cols == i).astype(jnp.float32)                # (1, H)
        w = _cast(w1_ref[pl.ds(i, 1), :, :].reshape(d, k), mxu_bf16)
        ai = jnp.sum(a * sel, axis=1, keepdims=True)         # (TE, 1)
        t_h = _mm(xj, w)                                     # (TE, K)
        # d_a[:, i] = Σ_k t_h ⊙ g — scattered back via the same mask
        da_col = jnp.sum(t_h * g, axis=1, keepdims=True)     # (TE, 1)
        da = da + da_col * sel
        tmp = ai * g                                         # (TE, K)
        tmp16 = _cast(tmp, mxu_bf16)
        dw = jax.lax.dot_general(
            xj, tmp16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[None]                                              # (1, D, K)
        dw1_ref[pl.ds(i, 1), :, :] += dw
        dxj = dxj + jax.lax.dot_general(
            tmp16, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dxj, da

    dxj, da = jax.lax.fori_loop(0, h, body, (dxj0, da0))
    dxj_ref[:] = dxj
    da_ref[:] = da


def _bwd_kernel_chunked(xj_ref, at_ref, w1t_ref, g_ref,
                        dxj_ref, da_ref, dw1_ref, db1_ref,
                        *, te, d, hp, k, g, mxu_bf16=False):
    """Chunked-contraction backward: G units per MXU step (see
    _fwd_kernel_chunked). Lane-slice-free by construction — Mosaic
    forbids dynamic lane slices and compiles misaligned static ones
    pathologically slowly — so `a` arrives transposed (sublane-sliced),
    the weights arrive as W1ᵀ rows (Hp·K, D) (sublane-sliced, contracted
    via dot_general transposes), and da chunks land through a tiny
    placement matmul instead of lane writes:

        T_c   = xj ·ᵈ W1ᵀ_c            (TE, G·K)   all units' xj@W1[h]
        da   += ((T_c ⊙ g_rep) @ S2K) @ E_c        per-unit ⟨·, g⟩ rows
        dW_c  = X_cᵀ @ g               (G·D, K)    X_c as in the forward
        dxj  += (a_expK ⊙ g_rep) ·ᵈ W1ᵀ_c          (TE, D)
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)

    xj = xj_ref[:]                              # (TE, D)
    gg = g_ref[:]                               # (TE, K)
    # mxu_bf16 rounds the heavy contractions' operands (placement/one-hot
    # matmuls stay exact f32); accumulation stays f32.
    xj16, gg16 = _cast(xj, mxu_bf16), _cast(gg, mxu_bf16)
    db1_ref[:] += jax.lax.dot_general(
        xj16, gg16, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # replication / expansion one-hots (constants)
    rr = jax.lax.broadcasted_iota(jnp.int32, (d, g * d), 0)
    rc = jax.lax.broadcasted_iota(jnp.int32, (d, g * d), 1)
    xj_rep = _mm(xj, (rr == rc % d).astype(jnp.float32))    # (TE, G*D)
    kr = jax.lax.broadcasted_iota(jnp.int32, (k, g * k), 0)
    kc = jax.lax.broadcasted_iota(jnp.int32, (k, g * k), 1)
    g_rep = _mm(gg, (kr == kc % k).astype(jnp.float32))     # (TE, G*K)
    sr = jax.lax.broadcasted_iota(jnp.int32, (g, g * d), 0)
    sc = jax.lax.broadcasted_iota(jnp.int32, (g, g * d), 1)
    S = (sr == sc // d).astype(jnp.float32)                 # (G, G*D)
    skr = jax.lax.broadcasted_iota(jnp.int32, (g, g * k), 0)
    skc = jax.lax.broadcasted_iota(jnp.int32, (g, g * k), 1)
    SK = (skr == skc // k).astype(jnp.float32)              # (G, G*K)
    s2r = jax.lax.broadcasted_iota(jnp.int32, (g * k, g), 0)
    s2c = jax.lax.broadcasted_iota(jnp.int32, (g * k, g), 1)
    S2K = (s2r // k == s2c).astype(jnp.float32)             # (G*K, G)
    er = jax.lax.broadcasted_iota(jnp.int32, (g, hp), 0)
    ec = jax.lax.broadcasted_iota(jnp.int32, (g, hp), 1)

    dxj0 = jnp.zeros((te, d), jnp.float32)
    da0 = jnp.zeros((te, hp), jnp.float32)

    def body(c, carry):
        dxj, da = carry
        at_c = at_ref[pl.ds(c * g, g), :]                   # (G, TE)
        wt_c = w1t_ref[pl.ds(c * g * k, g * k), :]          # (G*K, D)
        wt_c16 = _cast(wt_c, mxu_bf16)
        # T_c: every unit's xj @ W1[h], laid out in K-lane blocks
        t_c = jax.lax.dot_general(
            xj16, wt_c16, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (TE, G*K)
        da_c = _mm(t_c * g_rep, S2K)                        # (TE, G)
        # placement matmul: column cG+g' of da gets da_c[:, g']
        e_c = (ec - c * g == er).astype(jnp.float32)        # (G, Hp)
        da = da + _mm(da_c, e_c)
        # dW: forward's X_c re-expanded, contracted over the tile rows
        a_expd = jax.lax.dot_general(
            at_c, S, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (TE, G*D)
        x_c = a_expd * xj_rep
        dw_c = jax.lax.dot_general(
            _cast(x_c, mxu_bf16), gg16,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (G*D, K)
        dw1_ref[pl.ds(c * g * d, g * d), :] += dw_c
        # dxj: V_c = a-expanded cotangent, contracted against W1ᵀ rows
        a_expk = jax.lax.dot_general(
            at_c, SK, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (TE, G*K)
        dxj = dxj + jax.lax.dot_general(
            _cast(a_expk * g_rep, mxu_bf16), wt_c16,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (TE, D)
        return dxj, da

    dxj, da = jax.lax.fori_loop(0, hp // g, body, (dxj0, da0))
    dxj_ref[:] = dxj
    da_ref[:] = da


def _reference_compose(xj, a, w1, b1):
    """Pure-XLA oracle / interpret+manual fallback: identical math."""
    e, d = xj.shape
    k = b1.shape[0] // d
    w_e = (a @ w1 + b1).reshape(e, d, k)
    return jnp.einsum("ed,edk->ek", xj, w_e,
                      preferred_element_type=jnp.float32)


def _fwd_kernel_chunked(xj_ref, at_ref, w1_ref, b1_ref, out_ref,
                        *, te, d, hp, k, g, mxu_bf16=False):
    """Chunked-contraction forward: G hidden units per MXU matmul.

    The unit-loop kernel above runs H sequential (TE, D) @ (D, K)
    matmuls; their 100-deep contractions leave the MXU pipeline-fill
    bound (~17% of peak measured). Here each step contracts G units at
    once as (TE, G·D) @ (G·D, K) with

        X_c[:, g·D + d] = a[:, cG+g] · xj[:, d]

    built on the MXU too: a lane-expansion one-hot S (a_chunk @ S) times
    a tiled-identity replication R (xj @ R) — ~10% extra FLOPs for
    G/8×-fewer, G×-deeper matmuls. Measured ×1.32 fwd at bulk-layer
    scale (bench_bilinear_v2.py). Constraints from Mosaic: dynamic
    sublane slice starts/sizes must be 8-aligned, hence g % 8 == 0 and
    the H→Hp zero-padding; `a` arrives TRANSPOSED (Hp, E) because
    dynamic lane slices are forbidden.
    """
    xj = xj_ref[:]                             # (TE, D)
    acc = _mm(xj, b1_ref[:])                   # bias term
    rr = jax.lax.broadcasted_iota(jnp.int32, (d, g * d), 0)
    rc = jax.lax.broadcasted_iota(jnp.int32, (d, g * d), 1)
    xj_rep = _mm(xj, (rr == rc % d).astype(jnp.float32))   # (TE, G*D)
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, g * d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, g * d), 1)
    S = (rows == cols // d).astype(jnp.float32)

    def body(c, acc):
        at_chunk = at_ref[pl.ds(c * g, g), :]              # (G, TE)
        a_exp = jax.lax.dot_general(
            at_chunk, S, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (TE, G*D)
        w_c = w1_ref[pl.ds(c * g * d, g * d), :]           # (G*D, K)
        # mxu_bf16 rounds only the FLOP-heavy contraction's operands (the
        # one-hot placement matmuls above stay exact f32); accumulation
        # stays f32 via preferred_element_type.
        return acc + _mm(_cast(a_exp * xj_rep, mxu_bf16), _cast(w_c, mxu_bf16))

    acc = jax.lax.fori_loop(0, hp // g, body, acc)
    out_ref[:] = acc


def _cfg(cfg):
    # cfg = (edge_tile, interpret[, mxu_bf16]) — the optional third element
    # keeps older 2-tuple call sites valid.
    te, interpret = cfg[0], cfg[1]
    mxu_bf16 = bool(cfg[2]) if len(cfg) > 2 else False
    return te, interpret, mxu_bf16


def _fwd_impl(cfg, xj, a, w1, b1):
    te, interpret, mxu_bf16 = _cfg(cfg)
    # cfg[3] (optional) forces the chunked forward on/off; default is
    # chunked on compiled (TPU) runs — measured ×1.32 over the unit-loop
    # forward — and unit-loop in interpret mode (bit-parity baseline).
    chunked = bool(cfg[3]) if len(cfg) > 3 else not interpret
    e, d = xj.shape
    h = a.shape[1]
    k = b1.shape[0] // d
    in_manual = bool(getattr(jax.typeof(xj), "vma", frozenset()))
    if interpret and in_manual:
        return _reference_compose(xj, a, w1, b1)
    ep = _round_up(e, te)
    if ep != e:
        xj = jnp.pad(xj, ((0, ep - e), (0, 0)))
        a = jnp.pad(a, ((0, ep - e), (0, 0)))
    if chunked:
        g = 8  # 8-aligned sublane chunks; plateau is flat in g (KERNELS.md)
        # (tf, G·D) intermediates + resident W1 must fit the 16 MB scoped
        # VMEM budget: tf=2048 OOMs at compile time, 1024 fits (and
        # measures marginally best).
        tf = min(te, 1024)
        # re-tile from the caller's te-padding to tf (slice back to the
        # true e first — round_up(e, te) can exceed round_up(e, tf))
        ep = _round_up(e, tf)
        if ep != xj.shape[0]:
            pad = ep - e
            xj = jnp.pad(xj[:e], ((0, pad), (0, 0)))
            a = jnp.pad(a[:e], ((0, pad), (0, 0)))
        hp = _round_up(h, g)
        w1v = w1.reshape(h, d, k)
        if hp != h:
            a = jnp.pad(a, ((0, 0), (0, hp - h)))
            w1v = jnp.pad(w1v, ((0, hp - h), (0, 0), (0, 0)))
        out = pl.pallas_call(
            partial(_fwd_kernel_chunked, te=tf, d=d, hp=hp, k=k, g=g,
                    mxu_bf16=mxu_bf16),
            grid=(ep // tf,),
            in_specs=[
                pl.BlockSpec((tf, d), lambda i: (i, 0)),
                pl.BlockSpec((hp, tf), lambda i: (0, i)),
                pl.BlockSpec((hp * d, k), lambda i: (0, 0)),
                pl.BlockSpec((d, k), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tf, k), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ep, k), jnp.float32),
            interpret=interpret,
        )(xj, a.T, w1v.reshape(hp * d, k), b1.reshape(d, k))
        return out[:e]
    out = pl.pallas_call(
        partial(_fwd_kernel, te=te, d=d, h=h, k=k, mxu_bf16=mxu_bf16),
        grid=(ep // te,),
        in_specs=[
            pl.BlockSpec((te, d), lambda i: (i, 0)),
            pl.BlockSpec((te, h), lambda i: (i, 0)),
            pl.BlockSpec((h, d, k), lambda i: (0, 0, 0)),
            pl.BlockSpec((d, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((te, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ep, k), jnp.float32),
        interpret=interpret,
    )(xj, a, w1.reshape(h, d, k), b1.reshape(d, k))
    return out[:e]


def _bwd_impl(cfg, xj, a, w1, b1, g):
    te, interpret, mxu_bf16 = _cfg(cfg)
    chunked = bool(cfg[3]) if len(cfg) > 3 else not interpret
    e, d = xj.shape
    h = a.shape[1]
    k = b1.shape[0] // d
    ep = _round_up(e, te)
    if ep != e:
        xj = jnp.pad(xj, ((0, ep - e), (0, 0)))
        a = jnp.pad(a, ((0, ep - e), (0, 0)))
        g = jnp.pad(g, ((0, ep - e), (0, 0)))
    if chunked:
        gc = 8
        # (tb, G·K)-shaped loop intermediates × the resident W1ᵀ + dW
        # blocks must fit the 16 MB scoped-VMEM budget: tb=512 measures
        # 17.3 MB (compile-time OOM), tb=256 fits.
        tb = min(te, 256)
        # re-tile from the caller's te-padding to tb (slice back to the
        # true e first — round_up(e, te) can exceed round_up(e, tb))
        ep = _round_up(e, tb)
        if ep != xj.shape[0]:
            pad = ep - e
            xj = jnp.pad(xj[:e], ((0, pad), (0, 0)))
            a = jnp.pad(a[:e], ((0, pad), (0, 0)))
            g = jnp.pad(g[:e], ((0, pad), (0, 0)))
        hp = _round_up(h, gc)
        w3 = w1.reshape(h, d, k)
        if hp != h:
            a = jnp.pad(a, ((0, 0), (0, hp - h)))
            w3 = jnp.pad(w3, ((0, hp - h), (0, 0), (0, 0)))
        w1t = w3.transpose(0, 2, 1).reshape(hp * k, d)   # W1ᵀ rows
        dxj, da, dw1, db1 = pl.pallas_call(
            partial(_bwd_kernel_chunked, te=tb, d=d, hp=hp, k=k, g=gc,
                    mxu_bf16=mxu_bf16),
            grid=(ep // tb,),
            in_specs=[
                pl.BlockSpec((tb, d), lambda i: (i, 0)),
                pl.BlockSpec((hp, tb), lambda i: (0, i)),
                pl.BlockSpec((hp * k, d), lambda i: (0, 0)),
                pl.BlockSpec((tb, k), lambda i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tb, d), lambda i: (i, 0)),
                pl.BlockSpec((tb, hp), lambda i: (i, 0)),
                pl.BlockSpec((hp * d, k), lambda i: (0, 0)),
                pl.BlockSpec((d, k), lambda i: (0, 0)),
            ],
            out_shape=(
                jax.ShapeDtypeStruct((ep, d), jnp.float32),
                jax.ShapeDtypeStruct((ep, hp), jnp.float32),
                jax.ShapeDtypeStruct((hp * d, k), jnp.float32),
                jax.ShapeDtypeStruct((d, k), jnp.float32),
            ),
            interpret=interpret,
        )(xj, a.T, w1t, g)
        dxj = dxj[:e] + g[:e] @ b1.reshape(d, k).T
        dw1 = dw1.reshape(hp, d, k)[:h].reshape(h, d * k)
        return dxj, da[:e, :h], dw1, db1.reshape(d * k)
    dxj, da, dw1, db1 = pl.pallas_call(
        partial(_bwd_kernel, te=te, d=d, h=h, k=k, mxu_bf16=mxu_bf16),
        grid=(ep // te,),
        in_specs=[
            pl.BlockSpec((te, d), lambda i: (i, 0)),
            pl.BlockSpec((te, h), lambda i: (i, 0)),
            pl.BlockSpec((h, d, k), lambda i: (0, 0, 0)),
            pl.BlockSpec((te, k), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((te, d), lambda i: (i, 0)),
            pl.BlockSpec((te, h), lambda i: (i, 0)),
            pl.BlockSpec((h, d, k), lambda i: (0, 0, 0)),
            pl.BlockSpec((d, k), lambda i: (0, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((ep, d), jnp.float32),
            jax.ShapeDtypeStruct((ep, h), jnp.float32),
            jax.ShapeDtypeStruct((h, d, k), jnp.float32),
            jax.ShapeDtypeStruct((d, k), jnp.float32),
        ),
        interpret=interpret,
    )(xj, a, w1.reshape(h, d, k), g)
    # bias part of d_xj lives in XLA: d_xj += g @ b1ᵀ (kernel skips it so
    # b1 need not be an input of the backward pass).
    dxj = dxj[:e] + g[:e] @ b1.reshape(d, k).T
    return dxj, da[:e], dw1.reshape(h, d * k), db1.reshape(d * k)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_bilinear_msg(cfg, xj, a, w1, b1):
    """msg[e] = Σ_h a[e,h]·(xj[e] @ W1[h]) + xj[e] @ b1  — NNConv's
    edge-conditioned message with the (E, D, K) weight tensor kept in
    VMEM. cfg = (edge_tile, interpret[, mxu_bf16]); mxu_bf16 runs the
    MXU contractions with bf16 operands + f32 accumulation (the
    kernel-internal arm of `precision: bf16`)."""
    return _fwd_impl(cfg, xj, a, w1, b1)


def _fb_fwd(cfg, xj, a, w1, b1):
    return _fwd_impl(cfg, xj, a, w1, b1), (xj, a, w1, b1)


def _fb_bwd(cfg, res, g):
    xj, a, w1, b1 = res
    interpret = cfg[1]
    in_manual = bool(getattr(jax.typeof(xj), "vma", frozenset()))
    if interpret and in_manual:
        _, vjp = jax.vjp(lambda *p: _reference_compose(*p), xj, a, w1, b1)
        return vjp(g)
    return _bwd_impl(cfg, xj, a, w1, b1, g)


fused_bilinear_msg.defvjp(_fb_fwd, _fb_bwd)
