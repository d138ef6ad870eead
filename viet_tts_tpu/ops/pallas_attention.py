"""Fused (flash) self-attention kernels for TPU, in Pallas.

Three score flavours cover every attention in the framework; all use the
same online-softmax schedule so the (B, H, T, T) score tensor never exists
in HBM (PERF_NOTES.md §2 attributes the FS2 train step's byte floor to
exactly those tensors; the serving graphs pay the same forward traffic):

- ``flash_xl_attention``: the FS2-conformer Transformer-XL form
  (`nn/conformer.py`, parity target
  `models/tts/fastspeech2/blocks/conformer.py`) factorized by
  `ops/xl_attention.py` into two pre-rotated query streams (gA, gB) plus
  an iota-select (past / zero diagonal / future).
- ``flash_rel_attention``: the espnet "latest" rel-pos form
  (`nn/espnet_conformer.py`, espnet RelPositionMultiHeadedAttention).
  Its shift reads the symmetric (2T-1) table at relative position i - j,
  which factorizes into ONE rotated query stream against the negative
  half of the table: score_pos[i, j] = rot(g_i, +i) . t_{-j}
  (`ops/xl_attention.py:rotate_pairs` identity) — no select at all.
- ``flash_attention``: plain scaled-dot MHA (`nn/espnet_transformer.py`).

Layout: head-major (B, H, T, D) so each grid step addresses contiguous
(block, D) tiles.  Grid is (B, H, nq, nk) with the key axis innermost:
TPU grids execute sequentially, so the running max / denominator /
accumulator for one query block live in VMEM scratch across the nk sweep
(the standard TPU flash-attention schedule).  All matmuls run on the MXU
with fp32 accumulation; the select/exp chain is VPU work on the (bq, bk)
tile in VMEM.

Differentiation: each entry point carries a custom VJP whose backward
recomputes the factorized dense path and autodiffs it — the same trade
gradient remat makes (PERF_NOTES.md §2), but scoped to the attention op,
so the forward pass is flash even when the surrounding block is not
rematerialised.

Masking contract: ``pad`` is (B, T) float, 1.0 at PADDING keys (the
repo's pad_mask convention).  Masked keys score MASK_NEG before the
online softmax — matching the dense modules.  A fully-padded row
degrades to uniform attention exactly like the dense softmax does.

Numerics pinned against the padded-reshape oracles in
`tests/test_pallas_attention.py` / `tests/test_espnet_attention.py`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_NEG = -1.0e9
_LANES = 128


def _block_size(t: int, preferred: int = 128) -> int:
    """Largest divisor of ``t`` that is <= preferred and a multiple of 8
    when possible (fp32 sublane tile).  Bucketed shapes in this repo are
    multiples of 32, so this normally returns 32..128."""
    for b in (preferred, 64, 32, 16, 8):
        if t % b == 0:
            return b
    return t


def _online_softmax_step(
    logits, v_tile, out_ref, m_scr, l_scr, acc_scr, ik, nk
):
    """One flash step: fold this key block's logits into the running
    (max, denom, accumulator); emit the normalized context on the last
    block of the sweep."""

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, MASK_NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p, v_tile, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * corr + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _emit():
        l = l_scr[:, :1]
        out_ref[0, 0] = jnp.where(
            l > 0.0, acc_scr[:] / jnp.maximum(l, 1e-30), 0.0
        ).astype(out_ref.dtype)


def _dot_t(a, b):
    """a @ b^T with fp32 MXU accumulation."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _xl_kernel(
    qc_ref, k_ref, v_ref, ga_ref, gb_ref, tab_ref, pad_ref, out_ref,
    m_scr, l_scr, acc_scr, *, scale, bq, bk, t_kv,
):
    iq, ik = pl.program_id(2), pl.program_id(3)
    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    pa = _dot_t(ga_ref[0, 0], tab_ref[:])
    pb = _dot_t(gb_ref[0, 0], tab_ref[:])
    i = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + iq * bq
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    pos = jnp.where(j <= i, pa, jnp.where(j >= i + 2, pb, 0.0))
    logits = (s + pos) * scale
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    logits = jnp.where(dead, MASK_NEG, logits)
    _online_softmax_step(
        logits, v_ref[0, 0], out_ref, m_scr, l_scr, acc_scr,
        ik, pl.num_programs(3),
    )


def _rel_kernel(
    qc_ref, k_ref, v_ref, g_ref, tab_ref, pad_ref, out_ref,
    m_scr, l_scr, acc_scr, *, scale, bq, bk, t_kv,
):
    ik = pl.program_id(3)
    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    pos = _dot_t(g_ref[0, 0], tab_ref[:])
    logits = (s + pos) * scale
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    logits = jnp.where(dead, MASK_NEG, logits)
    _online_softmax_step(
        logits, v_ref[0, 0], out_ref, m_scr, l_scr, acc_scr,
        ik, pl.num_programs(3),
    )


def _plain_kernel(
    q_ref, k_ref, v_ref, pad_ref, out_ref,
    m_scr, l_scr, acc_scr, *, scale, bq, bk, t_kv,
):
    ik = pl.program_id(3)
    logits = _dot_t(q_ref[0, 0], k_ref[0, 0]) * scale
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    logits = jnp.where(dead, MASK_NEG, logits)
    _online_softmax_step(
        logits, v_ref[0, 0], out_ref, m_scr, l_scr, acc_scr,
        ik, pl.num_programs(3),
    )


def _platform_forward(pallas_fn, dense_fn, operands, scale):
    """Resolve the forward at lowering time: the Pallas kernel on TPU, the
    dense factorized oracle on every other backend.  Eager CPU execution
    (``train/state.py:init_on_cpu``), the virtual-CPU multi-chip dryrun,
    and CPU test meshes all lower the dense branch; real-chip executables
    lower only the kernel."""
    return jax.lax.platform_dependent(
        *operands,
        tpu=functools.partial(pallas_fn, scale=scale),
        default=functools.partial(dense_fn, scale=scale),
    )


def _call_flash(kernel_fn, q_streams, k_streams, v, tables, pad, scale):
    """Shared pallas_call builder.

    q_streams: list of (B, H, T, Dq) query-side tensors (block over q);
    k_streams: list of (B, H, T, Dk) key-side tensors (block over k);
    tables: list of (T, E) shared tables (block over k); v rides with the
    key streams. Argument order handed to the kernel:
    ``*q_streams[:1], *k_streams, v, *q_streams[1:], *tables, pad``
    — i.e. (qc, k, v, extra-q..., tables..., pad), matching the kernel
    signatures above."""
    B, H, T, D = v.shape
    bq = _block_size(T)
    bk = _block_size(T)
    grid = (B, H, pl.cdiv(T, bq), pl.cdiv(T, bk))

    q_spec = lambda d: pl.BlockSpec(
        (1, 1, bq, d), lambda b, h, q, kk: (b, h, q, 0)
    )
    k_spec = lambda d: pl.BlockSpec(
        (1, 1, bk, d), lambda b, h, q, kk: (b, h, kk, 0)
    )
    tab_spec = lambda e: pl.BlockSpec((bk, e), lambda b, h, q, kk: (kk, 0))
    pad_spec = pl.BlockSpec((1, 1, bk), lambda b, h, q, kk: (b, 0, kk))

    args = (
        [q_streams[0]] + k_streams + [v] + q_streams[1:] + tables
        + [pad.reshape(B, 1, T)]
    )
    in_specs = (
        [q_spec(q_streams[0].shape[-1])]
        + [k_spec(s.shape[-1]) for s in k_streams]
        + [k_spec(D)]
        + [q_spec(s.shape[-1]) for s in q_streams[1:]]
        + [tab_spec(t.shape[-1]) for t in tables]
        + [pad_spec]
    )
    kernel = functools.partial(
        kernel_fn, scale=float(scale), bq=bq, bk=bk, t_kv=T
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, bq, D), lambda b, h, q, kk: (b, h, q, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )(*args)


# --------------------------------------------------------------------------
# XL (FS2 conformer) flavour
# --------------------------------------------------------------------------


def _xl_pallas(qc, k, v, gA, gB, table, pad, *, scale):
    # _call_flash arg order: qc, k, v, gA, gB, tab, pad == _xl_kernel's
    return _call_flash(_xl_kernel, [qc, gA, gB], [k], v, [table], pad, scale)


def _xl_forward(qc, k, v, gA, gB, table, pad, scale):
    return _platform_forward(
        _xl_pallas, _xl_dense, (qc, k, v, gA, gB, table, pad), scale
    )


def _xl_dense(qc, k, v, gA, gB, table, pad, scale):
    """Dense factorized oracle in head-major layout (backward recompute;
    mirrors `ops/xl_attention.py` math)."""
    T = qc.shape[2]
    content = jnp.einsum("bhqd,bhkd->bhqk", qc, k)
    pa = jnp.einsum("bhqe,ke->bhqk", gA, table)
    pb = jnp.einsum("bhqe,ke->bhqk", gB, table)
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    pos = jnp.where(j <= i, pa, jnp.where(j >= i + 2, pb, 0.0))
    logits = (content + pos) * scale
    logits = jnp.where(pad[:, None, None, :] > 0.5, MASK_NEG, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _xl_op(qc, k, v, gA, gB, table, pad, scale):
    return _xl_forward(qc, k, v, gA, gB, table, pad, scale)


def _xl_fwd(qc, k, v, gA, gB, table, pad, scale):
    return _xl_forward(qc, k, v, gA, gB, table, pad, scale), (
        qc, k, v, gA, gB, table, pad,
    )


def _xl_bwd(scale, res, g):
    qc, k, v, gA, gB, table, pad = res
    _, vjp = jax.vjp(
        lambda *a: _xl_dense(*a, pad, scale), qc, k, v, gA, gB, table
    )
    return (*vjp(g.astype(jnp.float32)), jnp.zeros_like(pad))


_xl_op.defvjp(_xl_fwd, _xl_bwd)


def flash_xl_attention(
    qc: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    gA: jnp.ndarray,
    gB: jnp.ndarray,
    table: jnp.ndarray,
    scale: float,
    pad_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Entry point used by `ops/xl_attention.py::xl_attention`.

    Takes the feature-last (B, T, H, D)/(B, T, H, E) streams that module
    produces, runs the head-major fused kernel, and returns the
    (B, T, H*D) context."""
    B, T, H, D = qc.shape
    hm = lambda x: jnp.transpose(x, (0, 2, 1, 3)).astype(jnp.float32)
    pad = (
        pad_mask.astype(jnp.float32)
        if pad_mask is not None
        else jnp.zeros((B, T), jnp.float32)
    )
    ctx = _xl_op(
        hm(qc), hm(k), hm(v), hm(gA), hm(gB),
        table.astype(jnp.float32), pad, float(scale),
    )
    return jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, T, H * D).astype(qc.dtype)


# --------------------------------------------------------------------------
# espnet "latest" rel-pos flavour (single rotated stream)
# --------------------------------------------------------------------------


def _rel_pallas(qc, k, v, g, table, pad, *, scale):
    return _call_flash(_rel_kernel, [qc, g], [k], v, [table], pad, scale)


def _rel_forward(qc, k, v, g, table, pad, scale):
    return _platform_forward(
        _rel_pallas, _rel_dense, (qc, k, v, g, table, pad), scale
    )


def _rel_dense(qc, k, v, g, table, pad, scale):
    content = jnp.einsum("bhqd,bhkd->bhqk", qc, k)
    pos = jnp.einsum("bhqe,ke->bhqk", g, table)
    logits = (content + pos) * scale
    logits = jnp.where(pad[:, None, None, :] > 0.5, MASK_NEG, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _rel_op(qc, k, v, g, table, pad, scale):
    return _rel_forward(qc, k, v, g, table, pad, scale)


def _rel_fwd(qc, k, v, g, table, pad, scale):
    return _rel_forward(qc, k, v, g, table, pad, scale), (
        qc, k, v, g, table, pad,
    )


def _rel_bwd(scale, res, g_out):
    qc, k, v, g, table, pad = res
    _, vjp = jax.vjp(
        lambda *a: _rel_dense(*a, pad, scale), qc, k, v, g, table
    )
    return (*vjp(g_out.astype(jnp.float32)), jnp.zeros_like(pad))


_rel_op.defvjp(_rel_fwd, _rel_bwd)


def flash_rel_attention(
    qc: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    g: jnp.ndarray,
    table: jnp.ndarray,
    scale: float,
    pad_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """espnet 'latest' rel-pos flash attention (feature-last API).

    qc = q + pos_bias_u, g = the pre-rotated position-query stream
    (`ops/espnet_attention.py:rel_pos_queries`), table = the negative half
    of the symmetric rel table (t_{-j}, j = 0..T-1)."""
    B, T, H, D = qc.shape
    hm = lambda x: jnp.transpose(x, (0, 2, 1, 3)).astype(jnp.float32)
    pad = (
        pad_mask.astype(jnp.float32)
        if pad_mask is not None
        else jnp.zeros((B, T), jnp.float32)
    )
    ctx = _rel_op(
        hm(qc), hm(k), hm(v), hm(g),
        table.astype(jnp.float32), pad, float(scale),
    )
    return jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, T, H * D).astype(qc.dtype)


# --------------------------------------------------------------------------
# plain scaled-dot flavour
# --------------------------------------------------------------------------


def _plain_pallas(q, k, v, pad, *, scale):
    return _call_flash(_plain_kernel, [q], [k], v, [], pad, scale)


def _plain_forward(q, k, v, pad, scale):
    return _platform_forward(_plain_pallas, _plain_dense, (q, k, v, pad), scale)


def _plain_dense(q, k, v, pad, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    logits = jnp.where(pad[:, None, None, :] > 0.5, MASK_NEG, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _plain_op(q, k, v, pad, scale):
    return _plain_forward(q, k, v, pad, scale)


def _plain_fwd(q, k, v, pad, scale):
    return _plain_forward(q, k, v, pad, scale), (q, k, v, pad)


def _plain_bwd(scale, res, g_out):
    q, k, v, pad = res
    _, vjp = jax.vjp(lambda *a: _plain_dense(*a, pad, scale), q, k, v)
    return (*vjp(g_out.astype(jnp.float32)), jnp.zeros_like(pad))


_plain_op.defvjp(_plain_fwd, _plain_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    pad_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Plain scaled-dot MHA flash attention (feature-last API):
    q/k/v (B, T, H, D), pad_mask (B, T) True at padding keys; returns
    (B, T, H*D)."""
    B, T, H, D = q.shape
    hm = lambda x: jnp.transpose(x, (0, 2, 1, 3)).astype(jnp.float32)
    pad = (
        pad_mask.astype(jnp.float32)
        if pad_mask is not None
        else jnp.zeros((B, T), jnp.float32)
    )
    ctx = _plain_op(hm(q), hm(k), hm(v), pad, float(scale))
    return jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, T, H * D).astype(q.dtype)
