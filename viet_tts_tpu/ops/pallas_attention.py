"""Fused (flash) Transformer-XL attention for TPU, in Pallas.

Companion to `ops/xl_attention.py`: that module factorizes the XL
relative-shift into three plain matmuls plus an iota-select; this one fuses
them with an online softmax so the (B, H, T, T) score tensor never exists
in HBM.  PERF_NOTES.md §2 attributes the FS2 train step's byte floor to
exactly those score tensors (134 MB copies each way); the serving graphs
pay the same forward traffic.

Layout: the kernel works on head-major (B, H, T, D) tensors so each grid
step addresses contiguous (block, D) tiles.  Grid is (B, H, nq, nk) with
the key axis innermost: TPU grids execute sequentially, so the running
max / denominator / accumulator for one query block live in VMEM scratch
across the nk sweep (the standard TPU flash-attention schedule).

Per (q-block, k-block) tile, with global row i and column j:

    logits = qc @ k^T + past(i,j) * gA @ t^T + future(i,j) * gB @ t^T
    past   = j <= i,  future = j >= i + 2        (XL shift index map,
                                                  `ops/xl_attention.py`)

All matmuls run on the MXU in fp32 accumulation; the select/exp chain is
VPU work on the (bq, bk) tile in VMEM.

Differentiation: `flash_xl_attention` carries a custom VJP whose backward
recomputes the factorized dense path and autodiffs it — the same
trade gradient remat makes (PERF_NOTES.md §2), but scoped to the
attention op, so the forward pass is flash even when the surrounding
block is not rematerialised.  Gradients match the dense path bit-for-bit
in expectation and to fp32 rounding in tests.

Parity target: `models/tts/fastspeech2/blocks/conformer.py` (the
reference's torch rel-pos attention); numerics pinned against the
padded-reshape oracle in `tests/test_xl_attention.py` and
`tests/test_pallas_attention.py`.
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


def _flash_kernel(
    qc_ref, k_ref, v_ref, ga_ref, gb_ref, tab_ref, pad_ref,
    out_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, bq: int, bk: int, t_kv: int,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, MASK_NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qc = qc_ref[0, 0]  # (bq, D)
    k = k_ref[0, 0]    # (bk, D)
    ga = ga_ref[0, 0]  # (bq, E)
    gb = gb_ref[0, 0]  # (bq, E)
    tab = tab_ref[:]   # (bk, E)

    s = jax.lax.dot_general(
        qc, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    pa = jax.lax.dot_general(
        ga, tab, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    pb = jax.lax.dot_general(
        gb, tab, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    i = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + iq * bq
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    pos = jnp.where(j <= i, pa, jnp.where(j >= i + 2, pb, 0.0))
    logits = (s + pos) * scale
    # key padding (1.0 at padding) and the cdiv tail beyond T_kv
    pad = pad_ref[0]  # (bk,)
    dead = (pad[None, :] > 0.5) | (j >= t_kv)
    logits = jnp.where(dead, MASK_NEG, logits)

    m_prev = m_scr[:, :1]                                   # (bq, 1)
    m_cur = jnp.max(logits, axis=-1, keepdims=True)          # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)                              # (bq, bk)
    corr = jnp.exp(m_prev - m_new)                           # (bq, 1)
    l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p, v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * corr + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _emit():
        # fully-masked rows (query padding) have l == 0; emit zeros there
        l = l_scr[:, :1]
        out_ref[0, 0] = jnp.where(
            l > 0.0, acc_scr[:] / jnp.maximum(l, 1e-30), 0.0
        ).astype(out_ref.dtype)


def _flash_forward(
    qc: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    gA: jnp.ndarray,
    gB: jnp.ndarray,
    table: jnp.ndarray,
    pad: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """Head-major flash XL attention.

    qc/k/v: (B, H, T, D); gA/gB: (B, H, T, E); table: (T, E);
    pad: (B, T) float, 1.0 at padding keys. Returns (B, H, T, D) fp32
    context.
    """
    B, H, T, D = qc.shape
    E = table.shape[-1]
    bq = _block_size(T)
    bk = _block_size(T)
    grid = (B, H, pl.cdiv(T, bq), pl.cdiv(T, bk))

    kernel = functools.partial(
        _flash_kernel, scale=float(scale), bq=bq, bk=bk, t_kv=T
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, q, kk: (b, h, q, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, q, kk: (b, h, kk, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, q, kk: (b, h, kk, 0)),
            pl.BlockSpec((1, 1, bq, E), lambda b, h, q, kk: (b, h, q, 0)),
            pl.BlockSpec((1, 1, bq, E), lambda b, h, q, kk: (b, h, q, 0)),
            pl.BlockSpec((bk, E), lambda b, h, q, kk: (kk, 0)),
            pl.BlockSpec((1, bk), lambda b, h, q, kk: (b, kk)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, D), lambda b, h, q, kk: (b, h, q, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )(qc, k, v, gA, gB, table, pad)


def _dense_headmajor(qc, k, v, gA, gB, table, pad, scale):
    """Dense factorized oracle in the kernel's head-major layout (the
    backward-recompute path; mirrors `ops/xl_attention.py` math)."""
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
def _flash_op(qc, k, v, gA, gB, table, pad, scale):
    return _flash_forward(qc, k, v, gA, gB, table, pad, scale)


def _flash_fwd(qc, k, v, gA, gB, table, pad, scale):
    return _flash_forward(qc, k, v, gA, gB, table, pad, scale), (
        qc, k, v, gA, gB, table, pad,
    )


def _flash_bwd(scale, res, g):
    qc, k, v, gA, gB, table, pad = res
    _, vjp = jax.vjp(
        lambda *a: _dense_headmajor(*a, pad, scale), qc, k, v, gA, gB, table
    )
    dqc, dk, dv, dgA, dgB, dtab = vjp(g.astype(jnp.float32))
    return dqc, dk, dv, dgA, dgB, dtab, jnp.zeros_like(pad)


_flash_op.defvjp(_flash_fwd, _flash_bwd)


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
    hm = lambda x: jnp.transpose(x, (0, 2, 1, 3))
    pad = (
        pad_mask.astype(jnp.float32)
        if pad_mask is not None
        else jnp.zeros((B, T), jnp.float32)
    )
    ctx = _flash_op(
        hm(qc).astype(jnp.float32),
        hm(k).astype(jnp.float32),
        hm(v).astype(jnp.float32),
        hm(gA).astype(jnp.float32),
        hm(gB).astype(jnp.float32),
        table.astype(jnp.float32),
        pad,
        float(scale),
    )
    return jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, T, H * D).astype(qc.dtype)
