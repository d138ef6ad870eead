"""Transformer-XL relative attention, refactored for the MXU.

The FS2-conformer attention (`nn/conformer.py:RelativeMultiHeadAttention`,
architecture parity with `models/tts/fastspeech2/blocks/conformer.py`)
computes its position score as ``(q + v_bias) @ pos_proj(table)^T`` followed
by the XL padded-reshape "relative shift".  On TPU that path is hostile:
the shift materialises two extra (B, H, T, T) copies (concat + reshape) on
top of the content and position score tensors, and autodiff stores them all
for the backward pass — the train step's HBM bottleneck (PERF_NOTES.md §2).

This module removes the shift entirely.  The shift's exact index map
(verified element-wise in ``tests/test_xl_attention.py``) is::

    shifted[i, j] = s[i,   T-1-(i-j)]   for j <= i     (true "past" term)
                  = 0                    for j == i+1
                  = s[i+1, j-i-2]        for j >  i+1   (the trick's quirk:
                                         row i reads row i+1's scores)

where ``s[i, c] = (q_i + v_bias) . p_c`` and ``p = pos_proj(table)``.
Because ``table`` is the fixed sinusoid table (`nn/utils.py:9`), every
``p_{j+delta}`` is a per-frequency Givens rotation of ``p_j`` (the sin/cos
addition formulas — the same identity RoPE exploits).  Pulling the
``pos_proj`` matrix onto the query side and pre-rotating per *row* turns
the whole shifted score into two plain dot products::

    shifted[i, j] = where(j <= i,  gA_i . t_j,
                    where(j == i+1, 0,  gB_i . t_j))

with ``gA_i = rot(K_h (q_i + v), (T-1-i) w)``,
``gB_i = rot(K_h (q_{i+1} + v), -(i+2) w)`` and ``t`` the raw sinusoid
table.  No gather, no concat/reshape copies: three matmuls and an
iota-select — exactly the shape a fused/flash attention kernel wants.
Numerics match the padded-reshape path to fp32 rounding.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

MASK_NEG = -1.0e9


def _pair_frequencies(d_model: int) -> jnp.ndarray:
    """omega_m for sin/cos pair m: 1 / 10000^(2m/d)  (matches
    `nn/utils.py:sinusoid_position_table`'s angle definition)."""
    m = jnp.arange(d_model // 2, dtype=jnp.float32)
    return 1.0 / jnp.power(10000.0, 2.0 * m / d_model)


def rotate_pairs(
    g: jnp.ndarray, delta: jnp.ndarray, row_axis: int = -2
) -> jnp.ndarray:
    """Per-row Givens rotation of sin/cos pairs.

    g: (..., E) with E even, pairs (2m, 2m+1) sharing frequency w_m; the
    row axis (length T, matching ``delta``) is ``row_axis`` — -2 for
    (T, E) layouts, -3 for (B, T, H, E). delta: (T,) per-row offsets.
    Returns g_hat with ``g_hat_i . t_j == g_i . t_{j + delta_i}`` for the
    sinusoid table t (from sin(a+b)/cos(a+b); exactness tested).
    """
    E = g.shape[-1]
    w = _pair_frequencies(E)  # (E/2,)
    ang = delta.astype(jnp.float32)[:, None] * w[None, :]  # (T, E/2)
    n_mid = (-row_axis) - 2  # axes between the row axis and the pair axis
    ang = ang.reshape(ang.shape[0], *([1] * n_mid), ang.shape[1])
    c, s = jnp.cos(ang), jnp.sin(ang)
    ge, go = g[..., 0::2], g[..., 1::2]
    he = ge * c - go * s
    ho = ge * s + go * c
    out = jnp.empty_like(g)
    out = out.at[..., 0::2].set(he)
    return out.at[..., 1::2].set(ho)


def xl_pos_query_stream(
    q_v: jnp.ndarray, pos_kernel: jnp.ndarray
) -> jnp.ndarray:
    """The UNROTATED folded position-query stream g = K_h(q + v_bias):
    (B, T, H, E).  The single-stream flash kernel
    (`ops/pallas_attention.py:flash_xl2_attention`) applies the per-row
    rotations in VMEM, so ``xl_pos_queries``'s two rotated copies never
    reach HBM on that path."""
    B, T, H, D = q_v.shape
    E = pos_kernel.shape[0]
    k3 = pos_kernel.reshape(E, H, D)
    # g[b,t,h,:] = K_h @ q'[b,t,h,:]
    return jnp.einsum("bthd,ehd->bthe", q_v, k3)


def xl_pos_queries(
    q_v: jnp.ndarray, pos_kernel: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold pos_proj into the query side and pre-rotate for the XL shift.

    q_v: (B, T, H, D) = q + v_bias; pos_kernel: (E, H*D) flax Dense kernel
    of ``pos_proj`` (E = d_model of the sinusoid table). Returns
    (gA, gB): (B, T, H, E) rotated query streams such that against the raw
    table t the products reproduce the shifted position score (module
    docstring). Row T-1 of gB is never selected (j > T); it holds the
    rolled row 0 rotation, masked downstream.
    """
    T = q_v.shape[1]
    g = xl_pos_query_stream(q_v, pos_kernel)
    idx = jnp.arange(T, dtype=jnp.float32)
    gA = rotate_pairs(g, (T - 1) - idx, row_axis=-3)
    g_next = jnp.roll(g, -1, axis=1)
    gB = rotate_pairs(g_next, -(idx + 2.0), row_axis=-3)
    return gA, gB


def xl_shift_masks(T: int, dtype=jnp.float32):
    """(past, future) {0,1} masks for the XL select; the j == i+1 diagonal
    is zero in both (the shift trick's injected zero column)."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    past = (j <= i).astype(dtype)
    future = (j >= i + 2).astype(dtype)
    return past, future


def xl_attention_scores(
    qc: jnp.ndarray,
    k: jnp.ndarray,
    gA: jnp.ndarray,
    gB: jnp.ndarray,
    table: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """Dense factorized XL logits: (B, H, T, T).

    qc = q + u_bias (B, T, H, D); k (B, T, H, D); gA/gB (B, T, H, E);
    table (T, E) raw sinusoids. Three matmuls + iota select — XLA fuses the
    select/add chain into one elementwise epilogue, no shift copies.
    """
    T = qc.shape[1]
    content = jnp.einsum("bqhd,bkhd->bhqk", qc, k)
    posA = jnp.einsum("bqhe,ke->bhqk", gA, table)
    posB = jnp.einsum("bqhe,ke->bhqk", gB, table)
    past, future = xl_shift_masks(T, posA.dtype)
    pos = posA * past + posB * future
    return (content + pos) * jnp.asarray(scale, content.dtype)


def xl_attention_reference(
    qc: jnp.ndarray,
    k: jnp.ndarray,
    q_v: jnp.ndarray,
    pos_kernel: jnp.ndarray,
    table: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """The padded-reshape path (oracle for tests; mirrors
    `nn/conformer.py:RelativeMultiHeadAttention`)."""
    B, T, H, D = qc.shape
    p = (table @ pos_kernel).reshape(1, T, H, D)
    content = jnp.einsum("bqhd,bkhd->bhqk", qc, k)
    pos = jnp.einsum("bqhd,bkhd->bhqk", q_v, jnp.broadcast_to(p, q_v.shape))
    b, h, t1, t2 = pos.shape
    padded = jnp.concatenate(
        [jnp.zeros((b, h, t1, 1), pos.dtype), pos], axis=-1
    )
    padded = padded.reshape(b, h, t2 + 1, t1)
    pos = padded[:, :, 1:].reshape(b, h, t1, t2)
    return (content + pos) * jnp.asarray(scale, content.dtype)


def xl_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    u_bias: jnp.ndarray,
    v_bias: jnp.ndarray,
    pos_kernel: jnp.ndarray,
    table: jnp.ndarray,
    scale: float,
    pad_mask: Optional[jnp.ndarray] = None,
    implementation: str = "dense",
    dropout_p: float = 0.0,
    dropout_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full factorized XL attention: (B, T, H, D) -> (B, T, H*D) context.

    q/k/v: (B, T, H, D) head-split projections; u_bias/v_bias: (H, D);
    pos_kernel: (E, H*D); table: (T, E); pad_mask: (B, T) True at padding
    keys (applied like the module: masked keys get MASK_NEG).

    implementation:
      "dense" — three-matmul logits (above) + plain softmax; same HBM
        class as standard attention but without the shift copies.
      "flash" — the Pallas fused kernel (`ops/pallas_attention.py`): online
        softmax, no (B, H, T, T) round-trip at all.
    """
    qc = q + u_bias
    if implementation == "flash":
        from viet_tts_tpu.ops.pallas_attention import (
            _XL2_MAX_T,
            _XL3_MAX_T,
            _padded_time,
            _xl3_padded_time,
            flash_xl2_attention,
            flash_xl3_attention,
            flash_xl_attention,
        )

        seed = None
        if dropout_p > 0.0 and dropout_rng is not None:
            seed = jax.random.randint(
                dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32,
            )
        if _xl3_padded_time(q.shape[1]) <= _XL3_MAX_T:
            # projected-table kernel: D-wide contraction, no position
            # stream at all (preferred whenever the whole (T, T) score
            # matrix fits VMEM)
            B, T, H, D = q.shape
            p = (table @ pos_kernel).reshape(T, H, D)
            return flash_xl3_attention(
                qc, k, v, q + v_bias, p, scale, pad_mask=pad_mask,
                dropout_p=dropout_p, dropout_seed=seed,
            )
        if _padded_time(q.shape[1]) <= _XL2_MAX_T:
            # single-stream kernel: rotations in VMEM, one (B,T,H,E)
            # stream instead of two rotated copies
            g = xl_pos_query_stream(q + v_bias, pos_kernel)
            return flash_xl2_attention(
                qc, k, v, g, table, scale, pad_mask=pad_mask,
                dropout_p=dropout_p, dropout_seed=seed,
            )
        gA, gB = xl_pos_queries(q + v_bias, pos_kernel)
        return flash_xl_attention(
            qc, k, v, gA, gB, table, scale, pad_mask=pad_mask,
            dropout_p=dropout_p, dropout_seed=seed,
        )
    gA, gB = xl_pos_queries(q + v_bias, pos_kernel)
    scores = xl_attention_scores(qc, k, gA, gB, table, scale)
    if pad_mask is not None:
        scores = jnp.where(pad_mask[:, None, None, :], MASK_NEG, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    B, T, H, D = q.shape
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return ctx.reshape(B, T, H * D)
