"""Fused (flash) self-attention kernels for TPU, in Pallas — fwd AND bwd.

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
(block, D) tiles.  Forward grid is (B, H, nq, nk) with the key axis
innermost: TPU grids execute sequentially, so the running max /
denominator / accumulator for one query block live in VMEM scratch across
the nk sweep (the standard TPU flash-attention schedule).  All matmuls
run on the MXU with fp32 accumulation; the select/exp chain is VPU work
on the (bq, bk) tile in VMEM.

Differentiation (VERDICT r4 item 1): each entry point carries a custom
VJP backed by TWO Pallas backward kernels per flavour that follow the
FlashAttention-2 schedule — the forward additionally emits the per-row
logsumexp, the backward recomputes the probability tile p = exp(logits -
lse) in VMEM and contracts it immediately, so the (B, H, T, T) score
tensor exists in neither direction:

- bwd-q, grid (B, H, nq, nk): accumulates the query-side grads (dq and
  the position-stream grads) over the key sweep;
- bwd-kv, grid (nk, B, H, nq) with the KEY axis OUTERMOST: accumulates
  dk / dv over the query sweep and the shared position-table grad over
  the full (B, H, nq) inner sweep (the table is shared across batch and
  heads, so its accumulator must outlive them — hence the grid order).

delta_i = sum_d g_id out_id (the FA2 row correction) is a cheap jnp
reduction outside the kernels.  On non-TPU lowering the custom VJP falls
back to autodiff of the dense factorized oracle — EXCEPT under
``pltpu.force_tpu_interpret_mode()``, which routes to the Pallas kernels
so CPU tests exercise the real kernel code (the r4 tests silently took
the dense branch; see ``_use_pallas``).

Masking contract: ``pad`` is (B, T) float, 1.0 at PADDING keys (the
repo's pad_mask convention).  Masked keys score MASK_NEG before the
online softmax — matching the dense modules.  A fully-padded row
degrades to uniform attention exactly like the dense softmax does (and
its backward zeroes d(logits) at masked keys exactly like the autodiff
of ``jnp.where(pad, MASK_NEG, logits)`` does).

Numerics pinned against the padded-reshape oracles in
`tests/test_pallas_attention.py` / `tests/test_espnet_attention.py`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_NEG = -1.0e9
_LANES = 128

# Preferred (bq, bk) tile edge.  The grid has (T/bq)*(T/bk) steps per
# (b, h): at the FS2 training shape (B=64, H=8, T=512, D=32) a 128 tile
# means 8192 grid steps per kernel launch and ~300k per train step across
# 12 layers x (fwd + bwd_q + bwd_kv) — per-step sequencing overhead, not
# bandwidth, dominated the r5 capture (flash 85 vs dense 193 samples/s).
# Larger tiles cut grid steps quadratically while every buffer still fits
# VMEM comfortably (scores tile 512x512 fp32 = 1 MB).  Overridable for
# A/B sweeps via env VIET_TTS_FLASH_BLOCK (read at trace time).
_PREFERRED_BLOCK = 256


def _preferred_block() -> int:
    import os

    return int(os.environ.get("VIET_TTS_FLASH_BLOCK", _PREFERRED_BLOCK))


def _zero_seed():
    return jnp.zeros((1,), jnp.int32)


def _seed_cotangent(seed):
    """custom_vjp cotangent for the integer seed operand (float0)."""
    return np.zeros(seed.shape, dtype=jax.dtypes.float0)


def _block_size(t: int, preferred: Optional[int] = None) -> int:
    """Largest divisor of ``t`` that is <= preferred and a multiple of 8
    when possible (fp32 sublane tile).  Bucketed shapes in this repo are
    multiples of 32 (see ``_padded_time``), so this normally returns
    32.._preferred_block()."""
    if preferred is None:
        preferred = _preferred_block()
    for b in (preferred, 512, 256, 128, 64, 32, 16, 8):
        if b <= preferred and t % b == 0:
            return b
    return t


def _padded_time(t: int) -> int:
    """Time length the kernels actually run at: the next multiple of 32.

    Without this, an awkward T picks a tiny block (T=504 = 8x63 -> block
    8), and the grid's q/k/table re-fetches explode — captured r5: the
    B=8 flash train step moved 57.7 GB/step vs the shift path's 27.9
    because every 8-row q block re-read its (8, 816) streams 63 times.
    The public wrappers pad the streams/table with zeros, extend pad_mask
    with ones (dead keys), and slice the context back; autodiff of the
    outer pad/slice handles the gradients, and the kernels' `j >= t_kv`
    mask plus the pad mask keep the tail inert."""
    return ((t + 31) // 32) * 32


def _interpret_forced() -> bool:
    """True while `pltpu.force_tpu_interpret_mode()` is active: route the
    platform dispatch to the Pallas branch so CPU tests run the kernels
    (in the interpreter) instead of silently testing dense-vs-dense."""
    try:
        from jax._src import config as _jcfg

        return (
            _jcfg.pallas_tpu_interpret_mode_context_manager.value is not None
        )
    except Exception:
        return False


def _dispatch(pallas_fn, dense_fn, operands, scale, dropout_p=0.0):
    """Resolve at lowering time: the Pallas kernel on TPU (or anywhere
    under forced interpret mode), the dense factorized oracle on every
    other backend.  Eager CPU execution (`train/state.py:init_on_cpu`),
    the virtual-CPU multi-chip dryrun, and CPU test meshes all lower the
    dense branch; real-chip executables lower only the kernel.

    Exception: dropout_p > 0 under forced interpret mode takes the dense
    branch — the TPU interpreter stubs `prng_random_bits` to zeros
    (jax/_src/pallas/mosaic/interpret/interpret_pallas_call.py), so the
    in-kernel mask would keep everything while still scaling by 1/keep.
    The real-chip dropout path is validated by tools/flash_bwd_probe.py."""
    if _interpret_forced():
        if dropout_p > 0.0:
            return dense_fn(*operands, scale=scale, dropout_p=dropout_p)
        return pallas_fn(*operands, scale=scale, dropout_p=0.0)
    return jax.lax.platform_dependent(
        *operands,
        tpu=functools.partial(pallas_fn, scale=scale, dropout_p=dropout_p),
        default=functools.partial(dense_fn, scale=scale, dropout_p=dropout_p),
    )


def _mx(x, like):
    """Cast an fp32 VMEM intermediate to ``like``'s dtype before an MXU
    contraction against it.  With bf16 streams (mixed-precision training
    casts params/activations to bf16 before the wrappers, r5) this keeps
    every matmul at native MXU rate with fp32 accumulation — the same
    posture the dense/shift paths get from XLA under the bf16 policy —
    and it is a no-op for fp32 streams."""
    return x.astype(like.dtype)


def _dot_t(a, b):
    """a @ b^T with fp32 MXU accumulation: (m, d) x (n, d) -> (m, n)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot(a, b):
    """a @ b with fp32 MXU accumulation: (m, k) x (k, n) -> (m, n)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_0(a, b):
    """a^T @ b with fp32 MXU accumulation: (k, m) x (k, n) -> (m, n)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------------
# forward kernels: online softmax, emitting (context, logsumexp)
# --------------------------------------------------------------------------


def _tile_dropout_mask(seed_ref, tile_id, shape, dropout_p):
    """Attention-weight dropout mask for one (bq, bk) tile, from the
    on-core PRNG seeded by (step seed, flattened tile id) — the tile id
    encodes (batch, head, q-block, k-block) identically in the forward
    and BOTH backward kernels (Mosaic caps prng_seed at 2 values), so
    the mask regenerates bit-identically across all three grids without
    ever existing in HBM.  Matches flax nn.Dropout semantics (iid
    Bernoulli on the post-softmax weights, kept weights scaled by 1/keep
    — scaling is applied by the callers)."""
    pltpu.prng_seed(seed_ref[0], tile_id)
    bits = pltpu.prng_random_bits(shape).astype(jnp.uint32)
    keep = 1.0 - dropout_p
    thresh = jnp.uint32(min(int(keep * 4294967296.0), 4294967295))
    return (bits < thresh).astype(jnp.float32)


def _fwd_tile_id(iq, ik):
    """Flattened (b, h, q-block, k-block) for the forward / bwd-q grids
    (B, H, nq, nk)."""
    b, h = pl.program_id(0), pl.program_id(1)
    n_h, n_q, n_k = (
        pl.num_programs(1), pl.num_programs(2), pl.num_programs(3),
    )
    return ((b * n_h + h) * n_q + iq) * n_k + ik


def _kv_tile_id(iq, ik):
    """The SAME flattened tile id computed from the bwd-kv grid
    (nk, B, H, nq) — key axis outermost."""
    b, h = pl.program_id(1), pl.program_id(2)
    n_h, n_q = pl.num_programs(2), pl.num_programs(3)
    n_k = pl.num_programs(0)
    return ((b * n_h + h) * n_q + iq) * n_k + ik


def _online_softmax_step(
    logits, v_tile, out_ref, lse_ref, m_scr, l_scr, acc_scr, ik, nk,
    drop_mask=None, keep=1.0,
):
    """One flash step: fold this key block's logits into the running
    (max, denom, accumulator); emit the normalized context and the row
    logsumexp (the backward's softmax reconstruction key) on the last
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
    # the denominator accumulates the UNdropped weights (dense drops after
    # softmax, so dropout never touches the normalizer)
    l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    p_v = p if drop_mask is None else p * (drop_mask * (1.0 / keep))
    pv = _dot(_mx(p_v, v_tile), v_tile)
    acc_scr[:] = acc_scr[:] * corr + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _emit():
        l = l_scr[:, :1]
        out_ref[0, 0] = jnp.where(
            l > 0.0, acc_scr[:] / jnp.maximum(l, 1e-30), 0.0
        ).astype(out_ref.dtype)
        # lse rides a trailing singleton lane dim: Mosaic requires output
        # block shapes whose last two dims are (÷8, ÷128) or equal to the
        # array dims — (bq, 1) against a (B, H, T, 1) array qualifies,
        # (1, bq) against (B, H, T) does not (probed on-chip, r5)
        lse_ref[0, 0] = (
            m_scr[:, :1] + jnp.log(jnp.maximum(l, 1e-30))
        ).astype(lse_ref.dtype)


def _xl_pos_select(pa, pb, iq, ik, bq, bk):
    """The XL shift's iota-select: past -> pa, the j == i+1 diagonal ->
    0, future -> pb (see ops/xl_attention.py docstring)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + iq * bq
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    sel_a = j <= i
    sel_b = j >= i + 2
    return jnp.where(sel_a, pa, jnp.where(sel_b, pb, 0.0)), sel_a, sel_b, j


def _xl_kernel(
    qc_ref, k_ref, v_ref, ga_ref, gb_ref, tab_ref, pad_ref, seed_ref,
    out_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale, bq, bk, t_kv, dropout_p,
):
    iq, ik = pl.program_id(2), pl.program_id(3)
    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    pa = _dot_t(ga_ref[0, 0], tab_ref[:])
    pb = _dot_t(gb_ref[0, 0], tab_ref[:])
    pos, _, _, j = _xl_pos_select(pa, pb, iq, ik, bq, bk)
    logits = (s + pos) * scale
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    logits = jnp.where(dead, MASK_NEG, logits)
    mask = (
        _tile_dropout_mask(seed_ref, _fwd_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    _online_softmax_step(
        logits, v_ref[0, 0], out_ref, lse_ref, m_scr, l_scr, acc_scr,
        ik, pl.num_programs(3), mask, 1.0 - dropout_p,
    )


def _rel_kernel(
    qc_ref, k_ref, v_ref, g_ref, tab_ref, pad_ref, seed_ref,
    out_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale, bq, bk, t_kv, dropout_p,
):
    iq, ik = pl.program_id(2), pl.program_id(3)
    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    pos = _dot_t(g_ref[0, 0], tab_ref[:])
    logits = (s + pos) * scale
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    logits = jnp.where(dead, MASK_NEG, logits)
    mask = (
        _tile_dropout_mask(seed_ref, _fwd_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    _online_softmax_step(
        logits, v_ref[0, 0], out_ref, lse_ref, m_scr, l_scr, acc_scr,
        ik, pl.num_programs(3), mask, 1.0 - dropout_p,
    )


def _plain_kernel(
    q_ref, k_ref, v_ref, pad_ref, seed_ref,
    out_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale, bq, bk, t_kv, dropout_p,
):
    iq, ik = pl.program_id(2), pl.program_id(3)
    logits = _dot_t(q_ref[0, 0], k_ref[0, 0]) * scale
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    logits = jnp.where(dead, MASK_NEG, logits)
    mask = (
        _tile_dropout_mask(seed_ref, _fwd_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    _online_softmax_step(
        logits, v_ref[0, 0], out_ref, lse_ref, m_scr, l_scr, acc_scr,
        ik, pl.num_programs(3), mask, 1.0 - dropout_p,
    )


def _call_flash(kernel_fn, q_streams, k_streams, v, tables, pad, seed,
                scale, dropout_p, bq=None, bk=None):
    """Shared forward pallas_call builder.

    q_streams: list of (B, H, T, Dq) query-side tensors (block over q);
    k_streams: list of (B, H, T, Dk) key-side tensors (block over k);
    tables: list of (T, E) shared tables (block over k); v rides with the
    key streams. Argument order handed to the kernel:
    ``*q_streams[:1], *k_streams, v, *q_streams[1:], *tables, pad``
    — i.e. (qc, k, v, extra-q..., tables..., pad), matching the kernel
    signatures above.  Returns (context (B, H, T, D), lse (B, H, T))."""
    B, H, T, D = v.shape
    bq = bq or _block_size(T)
    bk = bk or _block_size(T)
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
        + [pad.reshape(B, 1, T), seed]
    )
    in_specs = (
        [q_spec(q_streams[0].shape[-1])]
        + [k_spec(s.shape[-1]) for s in k_streams]
        + [k_spec(D)]
        + [q_spec(s.shape[-1]) for s in q_streams[1:]]
        + [tab_spec(t.shape[-1]) for t in tables]
        + [pad_spec, pl.BlockSpec(memory_space=pltpu.SMEM)]
    )
    kernel = functools.partial(
        kernel_fn, scale=float(scale), bq=bq, bk=bk, t_kv=T,
        dropout_p=float(dropout_p),
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ],
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, q, kk: (b, h, q, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, q, kk: (b, h, q, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )(*args)


# --------------------------------------------------------------------------
# backward kernels (FlashAttention-2 schedule)
# --------------------------------------------------------------------------


def _p_ds(raw_logits, dead, lse_row, delta_row, g_tile, v_tile, scale,
          drop_mask=None, keep=1.0):
    """Recompute the probability tile and d(raw logits) for one (bq, bk)
    tile.  p = exp(logits - lse) reconstructs the forward softmax; ds =
    p * (dp - delta) * scale is the FA2 identity; masked keys get ds = 0,
    matching autodiff of the dense path's `where(dead, MASK_NEG, ...)`.
    lse_row / delta_row arrive as (bq, 1) column tiles (see the lse
    layout note in `_online_softmax_step`).

    With dropout, the forward emits out = sum_j attn_ij m_ij/keep v_j, so
    dattn_ij = m_ij/keep (g_i . v_j) and the FA2 row correction delta_i =
    sum_j attn_ij dattn_ij still equals g_i . out_i — the callers keep
    computing it from (g, out) unchanged.  Returns (p_v, ds) where p_v is
    the dropped/rescaled tile the dv contraction needs."""
    logits = jnp.where(dead, MASK_NEG, raw_logits * scale)
    p = jnp.exp(logits - lse_row)
    dp = _dot_t(g_tile, v_tile)
    if drop_mask is not None:
        dp = dp * (drop_mask * (1.0 / keep))
    ds = p * (dp - delta_row) * scale
    ds = jnp.where(dead, 0.0, ds)
    p_v = p if drop_mask is None else p * (drop_mask * (1.0 / keep))
    return p_v, ds


def _xl_bwd_q_kernel(
    qc_ref, ga_ref, gb_ref, k_ref, v_ref, tab_ref, pad_ref,
    lse_ref, delta_ref, g_ref, seed_ref,
    dqc_ref, dga_ref, dgb_ref, dqc_scr, dga_scr, dgb_scr,
    *, scale, bq, bk, t_kv, dropout_p,
):
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dqc_scr[:] = jnp.zeros_like(dqc_scr)
        dga_scr[:] = jnp.zeros_like(dga_scr)
        dgb_scr[:] = jnp.zeros_like(dgb_scr)

    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    pa = _dot_t(ga_ref[0, 0], tab_ref[:])
    pb = _dot_t(gb_ref[0, 0], tab_ref[:])
    pos, sel_a, sel_b, j = _xl_pos_select(pa, pb, iq, ik, bq, bk)
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    mask = (
        _tile_dropout_mask(seed_ref, _fwd_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    _, ds = _p_ds(
        s + pos, dead, lse_ref[0, 0], delta_ref[0, 0],
        g_ref[0, 0], v_ref[0, 0], scale, mask, 1.0 - dropout_p,
    )
    dqc_scr[:] += _dot(_mx(ds, k_ref), k_ref[0, 0])
    dga_scr[:] += _dot(_mx(jnp.where(sel_a, ds, 0.0), tab_ref), tab_ref[:])
    dgb_scr[:] += _dot(_mx(jnp.where(sel_b, ds, 0.0), tab_ref), tab_ref[:])

    @pl.when(ik == pl.num_programs(3) - 1)
    def _emit():
        dqc_ref[0, 0] = dqc_scr[:].astype(dqc_ref.dtype)
        dga_ref[0, 0] = dga_scr[:].astype(dga_ref.dtype)
        dgb_ref[0, 0] = dgb_scr[:].astype(dgb_ref.dtype)


def _xl_bwd_kv_kernel(
    qc_ref, ga_ref, gb_ref, k_ref, v_ref, tab_ref, pad_ref,
    lse_ref, delta_ref, g_ref, seed_ref,
    dk_ref, dv_ref, dtab_ref, dk_scr, dv_scr, dtab_scr,
    *, scale, bq, bk, t_kv, dropout_p,
):
    ik, ib, ih, iq = (
        pl.program_id(0), pl.program_id(1), pl.program_id(2),
        pl.program_id(3),
    )
    nb, nh, nq = (
        pl.num_programs(1), pl.num_programs(2), pl.num_programs(3),
    )

    @pl.when(iq == 0)
    def _init_kv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when((ib == 0) & (ih == 0) & (iq == 0))
    def _init_tab():
        dtab_scr[:] = jnp.zeros_like(dtab_scr)

    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    pa = _dot_t(ga_ref[0, 0], tab_ref[:])
    pb = _dot_t(gb_ref[0, 0], tab_ref[:])
    pos, sel_a, sel_b, j = _xl_pos_select(pa, pb, iq, ik, bq, bk)
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    mask = (
        _tile_dropout_mask(seed_ref, _kv_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    p, ds = _p_ds(
        s + pos, dead, lse_ref[0, 0], delta_ref[0, 0],
        g_ref[0, 0], v_ref[0, 0], scale, mask, 1.0 - dropout_p,
    )
    dv_scr[:] += _dot_0(_mx(p, g_ref), g_ref[0, 0])
    dk_scr[:] += _dot_0(_mx(ds, qc_ref), qc_ref[0, 0])
    dtab_scr[:] += _dot_0(_mx(jnp.where(sel_a, ds, 0.0), ga_ref),
                          ga_ref[0, 0])
    dtab_scr[:] += _dot_0(_mx(jnp.where(sel_b, ds, 0.0), gb_ref),
                          gb_ref[0, 0])

    @pl.when(iq == nq - 1)
    def _emit_kv():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)

    @pl.when((ib == nb - 1) & (ih == nh - 1) & (iq == nq - 1))
    def _emit_tab():
        dtab_ref[:] = dtab_scr[:].astype(dtab_ref.dtype)


def _rel_bwd_q_kernel(
    qc_ref, g_pos_ref, k_ref, v_ref, tab_ref, pad_ref,
    lse_ref, delta_ref, g_ref, seed_ref,
    dqc_ref, dgp_ref, dqc_scr, dgp_scr,
    *, scale, bq, bk, t_kv, dropout_p,
):
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dqc_scr[:] = jnp.zeros_like(dqc_scr)
        dgp_scr[:] = jnp.zeros_like(dgp_scr)

    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    pos = _dot_t(g_pos_ref[0, 0], tab_ref[:])
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    mask = (
        _tile_dropout_mask(seed_ref, _fwd_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    _, ds = _p_ds(
        s + pos, dead, lse_ref[0, 0], delta_ref[0, 0],
        g_ref[0, 0], v_ref[0, 0], scale, mask, 1.0 - dropout_p,
    )
    dqc_scr[:] += _dot(_mx(ds, k_ref), k_ref[0, 0])
    dgp_scr[:] += _dot(_mx(ds, tab_ref), tab_ref[:])

    @pl.when(ik == pl.num_programs(3) - 1)
    def _emit():
        dqc_ref[0, 0] = dqc_scr[:].astype(dqc_ref.dtype)
        dgp_ref[0, 0] = dgp_scr[:].astype(dgp_ref.dtype)


def _rel_bwd_kv_kernel(
    qc_ref, g_pos_ref, k_ref, v_ref, tab_ref, pad_ref,
    lse_ref, delta_ref, g_ref, seed_ref,
    dk_ref, dv_ref, dtab_ref, dk_scr, dv_scr, dtab_scr,
    *, scale, bq, bk, t_kv, dropout_p,
):
    ik, ib, ih, iq = (
        pl.program_id(0), pl.program_id(1), pl.program_id(2),
        pl.program_id(3),
    )
    nb, nh, nq = (
        pl.num_programs(1), pl.num_programs(2), pl.num_programs(3),
    )

    @pl.when(iq == 0)
    def _init_kv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when((ib == 0) & (ih == 0) & (iq == 0))
    def _init_tab():
        dtab_scr[:] = jnp.zeros_like(dtab_scr)

    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    pos = _dot_t(g_pos_ref[0, 0], tab_ref[:])
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    mask = (
        _tile_dropout_mask(seed_ref, _kv_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    p, ds = _p_ds(
        s + pos, dead, lse_ref[0, 0], delta_ref[0, 0],
        g_ref[0, 0], v_ref[0, 0], scale, mask, 1.0 - dropout_p,
    )
    dv_scr[:] += _dot_0(_mx(p, g_ref), g_ref[0, 0])
    dk_scr[:] += _dot_0(_mx(ds, qc_ref), qc_ref[0, 0])
    dtab_scr[:] += _dot_0(_mx(ds, g_pos_ref), g_pos_ref[0, 0])

    @pl.when(iq == nq - 1)
    def _emit_kv():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)

    @pl.when((ib == nb - 1) & (ih == nh - 1) & (iq == nq - 1))
    def _emit_tab():
        dtab_ref[:] = dtab_scr[:].astype(dtab_ref.dtype)


def _plain_bwd_q_kernel(
    q_ref, k_ref, v_ref, pad_ref, lse_ref, delta_ref, g_ref, seed_ref,
    dq_ref, dq_scr, *, scale, bq, bk, t_kv, dropout_p,
):
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    s = _dot_t(q_ref[0, 0], k_ref[0, 0])
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    mask = (
        _tile_dropout_mask(seed_ref, _fwd_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    _, ds = _p_ds(
        s, dead, lse_ref[0, 0], delta_ref[0, 0],
        g_ref[0, 0], v_ref[0, 0], scale, mask, 1.0 - dropout_p,
    )
    dq_scr[:] += _dot(_mx(ds, k_ref), k_ref[0, 0])

    @pl.when(ik == pl.num_programs(3) - 1)
    def _emit():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _plain_bwd_kv_kernel(
    q_ref, k_ref, v_ref, pad_ref, lse_ref, delta_ref, g_ref, seed_ref,
    dk_ref, dv_ref, dk_scr, dv_scr, *, scale, bq, bk, t_kv, dropout_p,
):
    ik, iq = pl.program_id(0), pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init_kv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    s = _dot_t(q_ref[0, 0], k_ref[0, 0])
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    mask = (
        _tile_dropout_mask(seed_ref, _kv_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    p, ds = _p_ds(
        s, dead, lse_ref[0, 0], delta_ref[0, 0],
        g_ref[0, 0], v_ref[0, 0], scale, mask, 1.0 - dropout_p,
    )
    dv_scr[:] += _dot_0(_mx(p, g_ref), g_ref[0, 0])
    dk_scr[:] += _dot_0(_mx(ds, q_ref), q_ref[0, 0])

    @pl.when(iq == nq - 1)
    def _emit_kv():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _call_bwd_q(kernel_fn, q_streams, k_streams, tables, pad3, lse, delta,
                g, seed, scale, dropout_p, out_dims, bq, bk,
                extra_scratch=()):
    """bwd-q pallas_call: grid (B, H, nq, nk), key axis innermost; one
    output per entry of ``out_dims``, each blocked like a query stream,
    emitted after the key sweep.  Kernel ref order:
    (*q_streams, *k_streams, *tables, pad, lse, delta, g, *outs, *scr,
    *extra_scratch)."""
    B, H, T, D = g.shape
    grid = (B, H, pl.cdiv(T, bq), pl.cdiv(T, bk))
    q_spec = lambda d: pl.BlockSpec(
        (1, 1, bq, d), lambda b, h, q, kk: (b, h, q, 0)
    )
    k_spec = lambda d: pl.BlockSpec(
        (1, 1, bk, d), lambda b, h, q, kk: (b, h, kk, 0)
    )
    tab_spec = lambda e: pl.BlockSpec((bk, e), lambda b, h, q, kk: (kk, 0))
    pad_spec = pl.BlockSpec((1, 1, bk), lambda b, h, q, kk: (b, 0, kk))
    row_spec = pl.BlockSpec((1, 1, bq, 1), lambda b, h, q, kk: (b, h, q, 0))
    args = [*q_streams, *k_streams, *tables, pad3, lse, delta, g, seed]
    in_specs = (
        [q_spec(x.shape[-1]) for x in q_streams]
        + [k_spec(x.shape[-1]) for x in k_streams]
        + [tab_spec(t.shape[-1]) for t in tables]
        + [pad_spec, row_spec, row_spec, q_spec(D),
           pl.BlockSpec(memory_space=pltpu.SMEM)]
    )
    kernel = functools.partial(
        kernel_fn, scale=float(scale), bq=bq, bk=bk, t_kv=T,
        dropout_p=float(dropout_p),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, d), jnp.float32)
            for d in out_dims
        ],
        grid=grid,
        in_specs=in_specs,
        out_specs=[q_spec(d) for d in out_dims],
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32) for d in out_dims]
        + list(extra_scratch),
    )(*args)
    return out


def _call_bwd_kv(kernel_fn, q_streams, k_streams, tables, pad3, lse, delta,
                 g, seed, scale, dropout_p, tab_dim, bq, bk):
    """bwd-kv pallas_call: grid (nk, B, H, nq) — key axis OUTERMOST so the
    shared table-grad accumulator survives the whole (B, H, nq) inner
    sweep.  Outputs: dk (B,H,T,D), dv (B,H,T,D) and, if ``tab_dim``,
    dtable (T, tab_dim)."""
    B, H, T, D = g.shape
    grid = (pl.cdiv(T, bk), B, H, pl.cdiv(T, bq))
    q_spec = lambda d: pl.BlockSpec(
        (1, 1, bq, d), lambda kk, b, h, q: (b, h, q, 0)
    )
    k_spec = lambda d: pl.BlockSpec(
        (1, 1, bk, d), lambda kk, b, h, q: (b, h, kk, 0)
    )
    tab_spec = lambda e: pl.BlockSpec((bk, e), lambda kk, b, h, q: (kk, 0))
    pad_spec = pl.BlockSpec((1, 1, bk), lambda kk, b, h, q: (b, 0, kk))
    row_spec = pl.BlockSpec((1, 1, bq, 1), lambda kk, b, h, q: (b, h, q, 0))
    args = [*q_streams, *k_streams, *tables, pad3, lse, delta, g, seed]
    in_specs = (
        [q_spec(x.shape[-1]) for x in q_streams]
        + [k_spec(x.shape[-1]) for x in k_streams]
        + [tab_spec(t.shape[-1]) for t in tables]
        + [pad_spec, row_spec, row_spec, q_spec(D),
           pl.BlockSpec(memory_space=pltpu.SMEM)]
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
        jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
    ]
    out_specs = [k_spec(D), k_spec(D)]
    scratch = [
        pltpu.VMEM((bk, D), jnp.float32),
        pltpu.VMEM((bk, D), jnp.float32),
    ]
    if tab_dim:
        out_shape.append(jax.ShapeDtypeStruct((T, tab_dim), jnp.float32))
        out_specs.append(tab_spec(tab_dim))
        scratch.append(pltpu.VMEM((bk, tab_dim), jnp.float32))
    kernel = functools.partial(
        kernel_fn, scale=float(scale), bq=bq, bk=bk, t_kv=T,
        dropout_p=float(dropout_p),
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )(*args)


# --------------------------------------------------------------------------
# XL (FS2 conformer) flavour
# --------------------------------------------------------------------------


def _xl_pallas(qc, k, v, gA, gB, table, pad, seed, *, scale, dropout_p):
    # _call_flash arg order: qc, k, v, gA, gB, tab, pad == _xl_kernel's
    return _call_flash(
        _xl_kernel, [qc, gA, gB], [k], v, [table], pad, seed, scale,
        dropout_p,
    )


def _xl_forward(qc, k, v, gA, gB, table, pad, seed, scale, dropout_p):
    return _dispatch(
        _xl_pallas, _xl_dense, (qc, k, v, gA, gB, table, pad, seed),
        scale, dropout_p,
    )


def _dense_dropout(attn, seed, dropout_p):
    """Dense-path attention-weight dropout, deterministic in ``seed`` so
    the fallback VJP regenerates the forward's mask exactly (flax
    nn.Dropout semantics: iid Bernoulli, kept weights scaled 1/keep)."""
    keep = 1.0 - dropout_p
    mask = jax.random.bernoulli(
        jax.random.PRNGKey(seed[0].astype(jnp.uint32)), keep, attn.shape
    )
    return jnp.where(mask, attn / keep, 0.0)


def _xl_dense(qc, k, v, gA, gB, table, pad, seed, *, scale, dropout_p=0.0):
    """Dense factorized oracle in head-major layout (non-TPU fallback;
    mirrors `ops/xl_attention.py` math).  Returns (context, lse)."""
    T = qc.shape[2]
    f32 = jnp.float32  # fp32 logits/softmax/outputs regardless of stream
    content = jnp.einsum("bhqd,bhkd->bhqk", qc, k,
                         preferred_element_type=f32)
    pa = jnp.einsum("bhqe,ke->bhqk", gA, table, preferred_element_type=f32)
    pb = jnp.einsum("bhqe,ke->bhqk", gB, table, preferred_element_type=f32)
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    pos = jnp.where(j <= i, pa, jnp.where(j >= i + 2, pb, 0.0))
    logits = (content + pos) * scale
    logits = jnp.where(pad[:, None, None, :] > 0.5, MASK_NEG, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)[..., None]
    if dropout_p > 0.0:
        attn = _dense_dropout(attn, seed, dropout_p)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                      preferred_element_type=f32), lse


def _xl_bwd_pallas(qc, k, v, gA, gB, table, pad, lse, delta, g, seed,
                   *, scale, dropout_p):
    B, H, T, D = qc.shape
    E = table.shape[-1]
    bq = bk = _block_size(T)
    pad3 = pad.reshape(B, 1, T)
    dqc, dga, dgb = _call_bwd_q(
        _xl_bwd_q_kernel, [qc, gA, gB], [k, v], [table], pad3, lse, delta,
        g, seed, scale, dropout_p, [D, E, E], bq, bk,
    )
    dk, dv, dtab = _call_bwd_kv(
        _xl_bwd_kv_kernel, [qc, gA, gB], [k, v], [table], pad3, lse, delta,
        g, seed, scale, dropout_p, E, bq, bk,
    )
    return dqc, dk, dv, dga, dgb, dtab


def _xl_bwd_dense(qc, k, v, gA, gB, table, pad, lse, delta, g, seed,
                  *, scale, dropout_p=0.0):
    _, vjp = jax.vjp(
        lambda *a: _xl_dense(
            *a, pad, seed, scale=scale, dropout_p=dropout_p
        )[0],
        qc, k, v, gA, gB, table,
    )
    # fp32 like the Pallas branch (platform_dependent output types must
    # match); the caller downcasts to the primal dtypes
    return tuple(x.astype(jnp.float32) for x in vjp(g.astype(jnp.float32)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _xl_op(qc, k, v, gA, gB, table, pad, seed, scale, dropout_p):
    return _xl_forward(qc, k, v, gA, gB, table, pad, seed, scale,
                       dropout_p)[0]


def _xl_fwd(qc, k, v, gA, gB, table, pad, seed, scale, dropout_p):
    out, lse = _xl_forward(qc, k, v, gA, gB, table, pad, seed, scale,
                           dropout_p)
    return out, (qc, k, v, gA, gB, table, pad, seed, out, lse)


def _xl_bwd(scale, dropout_p, res, g):
    qc, k, v, gA, gB, table, pad, seed, out, lse = res
    delta = jnp.sum(g.astype(jnp.float32) * out, axis=-1, keepdims=True)
    # the cotangent rides the stream dtype so the kernels' dp/dv matmuls
    # stay at native MXU rate under bf16 streams (delta stays fp32)
    g = g.astype(v.dtype)
    grads = _dispatch(
        _xl_bwd_pallas, _xl_bwd_dense,
        (qc, k, v, gA, gB, table, pad, lse, delta, g, seed), scale,
        dropout_p,
    )
    grads = tuple(
        gr.astype(p.dtype) for gr, p in zip(grads, (qc, k, v, gA, gB,
                                                    table))
    )
    return (*grads, jnp.zeros_like(pad), _seed_cotangent(seed))


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
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Entry point used by `ops/xl_attention.py::xl_attention`.

    Takes the feature-last (B, T, H, D)/(B, T, H, E) streams that module
    produces, runs the head-major fused kernel, and returns the
    (B, T, H*D) context.  ``dropout_p`` > 0 applies attention-weight
    dropout inside the kernel (mask regenerated from ``dropout_seed``, a
    (1,) int32, in forward and backward — never materialised in HBM).

    bf16 inputs stay bf16 through the kernel's MXU contractions
    (softmax/LSE/accumulators fp32) — matching what XLA gives the
    dense/shift paths under the mixed-precision policy; everything else
    upcasts to fp32."""
    B, T, H, D = qc.shape
    cd = jnp.bfloat16 if qc.dtype == jnp.bfloat16 else jnp.float32
    hm = lambda x: jnp.transpose(x, (0, 2, 1, 3)).astype(cd)
    pad = (
        pad_mask.astype(jnp.float32)
        if pad_mask is not None
        else jnp.zeros((B, T), jnp.float32)
    )
    tp = _padded_time(T)
    table = table.astype(cd)
    if tp != T:
        ext = lambda x: jnp.pad(x, ((0, 0), (0, tp - T), (0, 0), (0, 0)))
        qc, k, v, gA, gB = map(ext, (qc, k, v, gA, gB))
        table = jnp.pad(table, ((0, tp - T), (0, 0)))
        pad = jnp.pad(pad, ((0, 0), (0, tp - T)), constant_values=1.0)
    seed = _zero_seed() if dropout_seed is None else dropout_seed
    ctx = _xl_op(
        hm(qc), hm(k), hm(v), hm(gA), hm(gB),
        table, pad, seed, float(scale), float(dropout_p),
    )
    ctx = jnp.transpose(ctx, (0, 2, 1, 3))[:, :T]
    return ctx.reshape(B, T, H * D).astype(qc.dtype)


# --------------------------------------------------------------------------
# XL v2: single position stream, rotations INSIDE the kernel (r5)
#
# The two-stream form above needs gA/gB = rotate_pairs(K_h(q + v_bias))
# materialised in HBM: at the FS2 training shape that is two
# (B, H, T, 384) tensors per layer that the backward re-reads twice more,
# plus the rotation VPU work and its autodiff — tools/flash_micro_bench.py
# showed the kernel itself already beats the shift path, so this stream
# production IS the full-step flash regression.  v2 streams only
# g = K_h(q + v_bias) (one tensor) and applies the per-row Givens
# rotations to the (bq, E) tile in VMEM, in both directions:
#
#   gA_i = rot(g_i, (T-1-i) w),  gB_i = rot(g_{i+1}, -(i+2) w)
#
# The g_{i+1} row shift is resolved entirely in-tile by requiring the
# query axis to be ONE block (bq = padded T): row bq-1's gB is only
# selected for keys j >= T+1, which the j >= t_kv mask kills, so a
# zero-filled static shift is exact.  Layout: the wrapper de-interleaves
# the sin/cos pairs of g and the table into [even | odd] halves so the
# kernel's pair split is two contiguous lane slices instead of stride-2
# lane gathers (the dot products are permutation-invariant as long as
# both sides share the layout).
# --------------------------------------------------------------------------


def _deinterleave_pairs(x):
    """(..., E) with sin/cos pairs (2m, 2m+1) -> (..., E) as
    [even components | odd components].  Linear + orthogonal; applied
    OUTSIDE the custom_vjp so autodiff chains the permutation."""
    return jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)


def _xl2_cos_sin(rows, e, t_sem, mode):
    """Per-row rotation angles in the deinterleaved layout.

    rows: (bq, 1) fp32 row indices; e: full (even) table dim; t_sem: the
    SEMANTIC sequence length (pre-padding — the wrapper pads streams with
    zero rows but the rotation deltas must keep using the original T).
    mode "A": delta_i = t_sem - 1 - i; mode "B": delta_i = -(i + 2).
    Returns (cos, sin): (bq, e // 2) fp32."""
    # integer iota + cast: Mosaic's tpu.iota only produces integer vectors
    # (fp32 iota verifies in interpret mode but fails TPU lowering)
    m = jax.lax.broadcasted_iota(jnp.int32, (1, e // 2), 1).astype(
        jnp.float32)
    w = jnp.exp(m * (-2.0 * np.log(10000.0) / e))
    delta = (t_sem - 1.0) - rows if mode == "A" else -(rows + 2.0)
    ang = delta * w
    return jnp.cos(ang), jnp.sin(ang)


def _xl2_rot(g2, cos, sin):
    """Apply the pair rotation in the deinterleaved layout:
    g2 (bq, E) fp32/bf16 -> rotated (bq, E) fp32."""
    e2 = g2.shape[-1] // 2
    ge = g2[:, :e2].astype(jnp.float32)
    go = g2[:, e2:].astype(jnp.float32)
    return jnp.concatenate([ge * cos - go * sin, ge * sin + go * cos],
                           axis=-1)


def _xl2_rot_inv(h2, cos, sin):
    """Inverse (transpose) of _xl2_rot — rotate by the negated angle."""
    e2 = h2.shape[-1] // 2
    he = h2[:, :e2].astype(jnp.float32)
    ho = h2[:, e2:].astype(jnp.float32)
    return jnp.concatenate([he * cos + ho * sin, ho * cos - he * sin],
                           axis=-1)


def _xl2_streams(g2_tile, tab_ref, bq, t_sem):
    """Rotated (gA2, gB2) MXU operands for one whole-T query tile."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0).astype(
        jnp.float32)
    e = g2_tile.shape[-1]
    ca, sa = _xl2_cos_sin(rows, e, t_sem, "A")
    cb, sb = _xl2_cos_sin(rows, e, t_sem, "B")
    g_next = jnp.concatenate(
        [g2_tile[1:], jnp.zeros_like(g2_tile[:1])], axis=0
    )
    ga2 = _mx(_xl2_rot(g2_tile, ca, sa), tab_ref)
    gb2 = _mx(_xl2_rot(g_next, cb, sb), tab_ref)
    return ga2, gb2, (ca, sa, cb, sb)


def _xl2_kernel(
    qc_ref, k_ref, v_ref, g2_ref, tab_ref, pad_ref, seed_ref,
    out_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale, bq, bk, t_kv, t_sem, dropout_p,
):
    iq, ik = pl.program_id(2), pl.program_id(3)
    ga2, gb2, _ = _xl2_streams(g2_ref[0, 0], tab_ref, bq, t_sem)
    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    pa = _dot_t(ga2, tab_ref[:])
    pb = _dot_t(gb2, tab_ref[:])
    pos, _, _, j = _xl_pos_select(pa, pb, iq, ik, bq, bk)
    logits = (s + pos) * scale
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    logits = jnp.where(dead, MASK_NEG, logits)
    mask = (
        _tile_dropout_mask(seed_ref, _fwd_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    _online_softmax_step(
        logits, v_ref[0, 0], out_ref, lse_ref, m_scr, l_scr, acc_scr,
        ik, pl.num_programs(3), mask, 1.0 - dropout_p,
    )


def _xl2_bwd_q_kernel(
    qc_ref, g2_ref, k_ref, v_ref, tab_ref, pad_ref,
    lse_ref, delta_ref, g_ref, seed_ref,
    dqc_ref, dg2_ref, dqc_scr, dga_scr, dgb_scr,
    *, scale, bq, bk, t_kv, t_sem, dropout_p,
):
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dqc_scr[:] = jnp.zeros_like(dqc_scr)
        dga_scr[:] = jnp.zeros_like(dga_scr)
        dgb_scr[:] = jnp.zeros_like(dgb_scr)

    ga2, gb2, (ca, sa, cb, sb) = _xl2_streams(
        g2_ref[0, 0], tab_ref, bq, t_sem
    )
    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    pa = _dot_t(ga2, tab_ref[:])
    pb = _dot_t(gb2, tab_ref[:])
    pos, sel_a, sel_b, j = _xl_pos_select(pa, pb, iq, ik, bq, bk)
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    mask = (
        _tile_dropout_mask(seed_ref, _fwd_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    _, ds = _p_ds(
        s + pos, dead, lse_ref[0, 0], delta_ref[0, 0],
        g_ref[0, 0], v_ref[0, 0], scale, mask, 1.0 - dropout_p,
    )
    dqc_scr[:] += _dot(_mx(ds, k_ref), k_ref[0, 0])
    dga_scr[:] += _dot(_mx(jnp.where(sel_a, ds, 0.0), tab_ref), tab_ref[:])
    dgb_scr[:] += _dot(_mx(jnp.where(sel_b, ds, 0.0), tab_ref), tab_ref[:])

    @pl.when(ik == pl.num_programs(3) - 1)
    def _emit():
        dqc_ref[0, 0] = dqc_scr[:].astype(dqc_ref.dtype)
        # chain the in-kernel rotations: dg = R_A^T dgA; dg_{i+1} +=
        # R_B^T(i) dgB_i (row i of gB consumed g_{i+1})
        dg = _xl2_rot_inv(dga_scr[:], ca, sa)
        dgb = _xl2_rot_inv(dgb_scr[:], cb, sb)
        dg += jnp.concatenate(
            [jnp.zeros_like(dgb[:1]), dgb[:-1]], axis=0
        )
        dg2_ref[0, 0] = dg.astype(dg2_ref.dtype)


def _xl2_bwd_kv_kernel(
    qc_ref, g2_ref, k_ref, v_ref, tab_ref, pad_ref,
    lse_ref, delta_ref, g_ref, seed_ref,
    dk_ref, dv_ref, dtab_ref, dk_scr, dv_scr, dtab_scr,
    *, scale, bq, bk, t_kv, t_sem, dropout_p,
):
    ik, ib, ih, iq = (
        pl.program_id(0), pl.program_id(1), pl.program_id(2),
        pl.program_id(3),
    )
    nb, nh, nq = (
        pl.num_programs(1), pl.num_programs(2), pl.num_programs(3),
    )

    @pl.when(iq == 0)
    def _init_kv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when((ib == 0) & (ih == 0) & (iq == 0))
    def _init_tab():
        dtab_scr[:] = jnp.zeros_like(dtab_scr)

    ga2, gb2, _ = _xl2_streams(g2_ref[0, 0], tab_ref, bq, t_sem)
    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    pa = _dot_t(ga2, tab_ref[:])
    pb = _dot_t(gb2, tab_ref[:])
    pos, sel_a, sel_b, j = _xl_pos_select(pa, pb, iq, ik, bq, bk)
    dead = (pad_ref[0, 0][None, :] > 0.5) | (j >= t_kv)
    mask = (
        _tile_dropout_mask(seed_ref, _kv_tile_id(iq, ik), (bq, bk),
                           dropout_p)
        if dropout_p > 0.0 else None
    )
    p, ds = _p_ds(
        s + pos, dead, lse_ref[0, 0], delta_ref[0, 0],
        g_ref[0, 0], v_ref[0, 0], scale, mask, 1.0 - dropout_p,
    )
    dv_scr[:] += _dot_0(_mx(p, g_ref), g_ref[0, 0])
    dk_scr[:] += _dot_0(_mx(ds, qc_ref), qc_ref[0, 0])
    dtab_scr[:] += _dot_0(
        _mx(jnp.where(sel_a, ds, 0.0), tab_ref), _mx(ga2, tab_ref)
    )
    dtab_scr[:] += _dot_0(
        _mx(jnp.where(sel_b, ds, 0.0), tab_ref), _mx(gb2, tab_ref)
    )

    @pl.when(iq == nq - 1)
    def _emit_kv():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)

    @pl.when((ib == nb - 1) & (ih == nh - 1) & (iq == nq - 1))
    def _emit_tab():
        dtab_ref[:] = dtab_scr[:].astype(dtab_ref.dtype)


def _xl2_block_k(T: int) -> int:
    """k-side tile for the whole-T-query xl2 kernels.  At T=1024 the
    bk=256 forward overflows the 16 MB scoped-VMEM budget by 200 KB
    (captured r5: t1008 compile OOM); bk=128 shaves the score/table tiles
    back under it.  Shorter T keeps the default tile."""
    return 128 if T > 512 else _block_size(T)


def _xl2_pallas(qc, k, v, g2, table, pad, seed, *, scale, dropout_p,
                t_sem):
    T = qc.shape[2]
    kernel = functools.partial(_xl2_kernel, t_sem=float(t_sem))
    return _call_flash(
        kernel, [qc, g2], [k], v, [table], pad, seed, scale, dropout_p,
        bq=T, bk=_xl2_block_k(T),
    )


def _xl2_dense(qc, k, v, g2, table, pad, seed, *, scale, dropout_p=0.0,
               t_sem=None):
    """Dense oracle in the deinterleaved single-stream parameterisation:
    reconstructs the rotated streams with the same math as the kernel
    (fp32), then reuses the two-stream dense body."""
    B, H, T, E = g2.shape
    t_sem = T if t_sem is None else t_sem
    rows = jnp.arange(T, dtype=jnp.float32)[:, None]
    ca, sa = _xl2_cos_sin(rows, E, float(t_sem), "A")
    cb, sb = _xl2_cos_sin(rows, E, float(t_sem), "B")
    flat = g2.reshape(B * H, T, E)
    rot = lambda x, c, s: jnp.concatenate(
        [x[..., : E // 2] * c - x[..., E // 2:] * s,
         x[..., : E // 2] * s + x[..., E // 2:] * c], axis=-1)
    gA = rot(flat.astype(jnp.float32), ca, sa).reshape(B, H, T, E)
    g_next = jnp.concatenate(
        [flat[:, 1:], jnp.zeros_like(flat[:, :1])], axis=1
    )
    gB = rot(g_next.astype(jnp.float32), cb, sb).reshape(B, H, T, E)
    return _xl_dense(qc, k, v, gA.astype(g2.dtype), gB.astype(g2.dtype),
                     table, pad, seed, scale=scale, dropout_p=dropout_p)


def _xl2_bwd_pallas(qc, k, v, g2, table, pad, lse, delta, g, seed,
                    *, scale, dropout_p, t_sem):
    B, H, T, D = qc.shape
    E = table.shape[-1]
    bq, bk = T, _xl2_block_k(T)
    pad3 = pad.reshape(B, 1, T)
    kq = functools.partial(_xl2_bwd_q_kernel, t_sem=float(t_sem))
    kkv = functools.partial(_xl2_bwd_kv_kernel, t_sem=float(t_sem))
    dqc, dg2 = _call_bwd_q(
        kq, [qc, g2], [k, v], [table], pad3, lse, delta,
        g, seed, scale, dropout_p, [D, E], bq, bk,
        extra_scratch=[pltpu.VMEM((bq, E), jnp.float32)],
    )
    dk, dv, dtab = _call_bwd_kv(
        kkv, [qc, g2], [k, v], [table], pad3, lse, delta,
        g, seed, scale, dropout_p, E, bq, bk,
    )
    return dqc, dk, dv, dg2, dtab


def _xl2_bwd_dense(qc, k, v, g2, table, pad, lse, delta, g, seed,
                   *, scale, dropout_p=0.0, t_sem=None):
    _, vjp = jax.vjp(
        lambda *a: _xl2_dense(
            *a, pad, seed, scale=scale, dropout_p=dropout_p, t_sem=t_sem
        )[0],
        qc, k, v, g2, table,
    )
    return tuple(x.astype(jnp.float32) for x in vjp(g.astype(jnp.float32)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _xl2_op(qc, k, v, g2, table, pad, seed, scale, dropout_p, t_sem):
    return _dispatch(
        functools.partial(_xl2_pallas, t_sem=t_sem),
        functools.partial(_xl2_dense, t_sem=t_sem),
        (qc, k, v, g2, table, pad, seed), scale, dropout_p,
    )[0]


def _xl2_fwd(qc, k, v, g2, table, pad, seed, scale, dropout_p, t_sem):
    out, lse = _dispatch(
        functools.partial(_xl2_pallas, t_sem=t_sem),
        functools.partial(_xl2_dense, t_sem=t_sem),
        (qc, k, v, g2, table, pad, seed), scale, dropout_p,
    )
    return out, (qc, k, v, g2, table, pad, seed, out, lse)


def _xl2_bwd(scale, dropout_p, t_sem, res, g):
    qc, k, v, g2, table, pad, seed, out, lse = res
    delta = jnp.sum(g.astype(jnp.float32) * out, axis=-1, keepdims=True)
    g = g.astype(v.dtype)
    grads = _dispatch(
        functools.partial(_xl2_bwd_pallas, t_sem=t_sem),
        functools.partial(_xl2_bwd_dense, t_sem=t_sem),
        (qc, k, v, g2, table, pad, lse, delta, g, seed), scale,
        dropout_p,
    )
    grads = tuple(
        gr.astype(p.dtype) for gr, p in zip(grads, (qc, k, v, g2, table))
    )
    return (*grads, jnp.zeros_like(pad), _seed_cotangent(seed))


_xl2_op.defvjp(_xl2_fwd, _xl2_bwd)

# VMEM budget for the whole-T query tile: g2/dgA/dgB (T, 384) fp32
# scratches + the (T, bk) score tile stay under the ~16 MB/core budget up
# to T=1024 (the reference's 1000-frame cap pads to at most 1024); longer
# sequences fall back to the two-stream flavour in `flash_xl_attention`.
_XL2_MAX_T = 1024


def flash_xl2_attention(
    qc: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    g: jnp.ndarray,
    table: jnp.ndarray,
    scale: float,
    pad_mask: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Single-stream XL flash attention (feature-last API).

    qc = q + u_bias (B, T, H, D); g = K_h(q + v_bias) (B, T, H, E) — the
    UNROTATED position-query stream (`ops/xl_attention.py:xl_pos_queries`
    without its rotate_pairs); table = raw sinusoids (T, E).  The per-row
    XL rotations happen inside the kernels, so the two rotated
    (B, H, T, E) streams never exist in HBM."""
    B, T, H, D = qc.shape
    cd = jnp.bfloat16 if qc.dtype == jnp.bfloat16 else jnp.float32
    hm = lambda x: jnp.transpose(x, (0, 2, 1, 3)).astype(cd)
    pad = (
        pad_mask.astype(jnp.float32)
        if pad_mask is not None
        else jnp.zeros((B, T), jnp.float32)
    )
    tp = _padded_time(T)
    g2 = _deinterleave_pairs(g)
    tab2 = _deinterleave_pairs(table).astype(cd)
    if tp != T:
        ext = lambda x: jnp.pad(x, ((0, 0), (0, tp - T), (0, 0), (0, 0)))
        qc, k, v, g2 = map(ext, (qc, k, v, g2))
        tab2 = jnp.pad(tab2, ((0, tp - T), (0, 0)))
        pad = jnp.pad(pad, ((0, 0), (0, tp - T)), constant_values=1.0)
    seed = _zero_seed() if dropout_seed is None else dropout_seed
    ctx = _xl2_op(
        hm(qc), hm(k), hm(v), hm(g2), tab2, pad, seed, float(scale),
        float(dropout_p), float(T),
    )
    ctx = jnp.transpose(ctx, (0, 2, 1, 3))[:, :T]
    return ctx.reshape(B, T, H * D).astype(qc.dtype)


# --------------------------------------------------------------------------
# XL v3: projected-table flavour — D-wide contraction, shear in VMEM (r5)
#
# The xl/xl2 flavours lift the position query into the sinusoid basis
# (E = d_model = 384) so the XL shift becomes Givens rotations: that kills
# the (B, H, T, T) HBM tensors but replaces them with (B, H, T, E) HBM
# streams and an 8x algorithmic FLOP multiplier on the BD term (E vs
# D = 48) — captured r5: xl2 full-step 116.8 samples/s vs the shift
# path's 188.3 at B=64, 191 vs 160 GB/step (bench_seed, PERF_NOTES §2e).
#
# v3 removes the lift entirely.  It streams only qv = q + v_bias
# (B, H, T, D — already needed) plus the PROJECTED position table
# p = pos_proj(table) per head ((H, T, D): ~100 KB, grid-invariant), and
# reproduces the shift's exact index map (ops/xl_attention.py docstring)
# inside one whole-(T, T) VMEM tile:
#
#   X = qv @ p'^T                     one (T, T, D) MXU contraction
#   S_past[i, j] = X[i,  (j - i - 1) % T]        } per-row lane rolls —
#   S_fut [i, j] = X[i+1,(j - i - 2 + pad) % T]  } ONE pltpu.roll each
#                                                  (shift, stride=1)
#   pos = where(j <= i, S_past, where(j >= i+2, S_fut, 0))
#
# where p' is p left-padded by (T_padded - T) zero rows so the past
# term's end-anchored index survives padding (the future term's
# start-anchored index is re-based by the same constant inside the roll
# shift).  No position stream, no rotation VPU work, no E-wide matmuls:
# per layer the only HBM attention traffic is qc/k/v/qv/ctx (B, H, T, D).
# The whole score matrix lives in VMEM, so forward does a plain (not
# online) softmax and the backward is ONE kernel emitting all five
# gradients; dp accumulates across the batch grid axis (b innermost).
# Restricted to T_padded <= 512 by the (T, T) fp32 VMEM residency; longer
# sequences fall back to xl2 (<= 1024) then xl.
# --------------------------------------------------------------------------

_XL3_MAX_T = 512


def _xl3_padded_time(t: int) -> int:
    """xl3 runs the whole (T, T) tile in VMEM: pad T to a lane multiple."""
    return ((t + 127) // 128) * 128


def _roll_lanes(x, sh, tp):
    """Cyclic right-roll along the lane axis by a STATIC amount."""
    if sh % _LANES == 0:
        # pure vreg permute: lane-aligned static slices + concat
        return jnp.concatenate([x[:, tp - sh:], x[:, : tp - sh]], axis=1)
    return pltpu.roll(x, sh, 1)


def _shear_rows(x, amounts, tp):
    """Right-roll row i of ``x`` (tp, tp) by ``amounts[i]`` (int32
    (tp, 1), values in [0, tp)) — log-step decomposition: one static
    cyclic roll + per-row bit select per power of two.  Mosaic's strided
    ``tpu.dynamic_rotate`` caps the per-vreg shift span at the vreg width
    (probed r5: 'max shift in a vreg 129 > 128' at tp=256), so the
    one-call strided roll cannot express a full shear."""
    sh = 1
    while sh < tp:
        x = jnp.where((amounts & sh) != 0, _roll_lanes(x, sh, tp), x)
        sh *= 2
    return x


def _wrap_mod(a, tp):
    """a mod tp for 0 <= a < 2*tp without integer division."""
    return jnp.where(a >= tp, a - tp, a)


def _xl3_shears(X, tp, d_pad):
    """(S_past, S_fut) from X = qv @ p'^T via per-row lane shears.

    The past term right-rolls row i by (i + 1); the future term by
    (i + 2 - d_pad) mod tp on the row-shifted matrix."""
    i = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    past = _shear_rows(X, _wrap_mod(i + 1, tp), tp)
    x2 = jnp.concatenate([X[1:], jnp.zeros_like(X[:1])], axis=0)
    s0f = (2 - d_pad) % tp
    fut = _shear_rows(x2, _wrap_mod(i + s0f, tp), tp)
    return past, fut


def _xl3_unshears(d_past, d_fut, tp, d_pad):
    """Transpose of `_xl3_shears`: inverse per-row rolls (amount
    tp - a_i mod tp), then the row shift's adjoint (row i of S_fut
    consumed X's row i+1)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    dx = _shear_rows(d_past, _wrap_mod(2 * tp - 1 - i - tp, tp), tp)
    s0f = (2 - d_pad) % tp
    dx2 = _shear_rows(
        d_fut, _wrap_mod(_wrap_mod(2 * tp - s0f - i, tp), tp), tp
    )
    return dx + jnp.concatenate(
        [jnp.zeros_like(dx2[:1]), dx2[:-1]], axis=0
    )


def _xl3_pos(qv, p, tp, d_pad):
    """The full (tp, tp) fp32 position-score tile + the iota selects."""
    x = _dot_t(qv, p)
    past, fut = _xl3_shears(x, tp, d_pad)
    i = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    sel_a = j <= i
    sel_b = j >= i + 2
    pos = jnp.where(sel_a, past, jnp.where(sel_b, fut, 0.0))
    return pos, sel_a, sel_b, j


def _xl3_logits(s, pos, pad_row, j, scale, tp, d_pad):
    """Two-tier masking: user-padded keys get MASK_NEG (like the dense
    path), wrapper-added TAIL keys get 2*MASK_NEG so a fully-padded row's
    uniform softmax fallback spans exactly the semantic key set the
    unpadded dense reference sees (exp(2M - M) underflows to 0) — one-tier
    masking made all-dead rows uniform over tp instead of T."""
    logits = (s + pos) * scale
    dead = (pad_row[None, :] > 0.5) | (j >= tp)
    logits = jnp.where(dead, MASK_NEG, logits)
    return jnp.where(j >= tp - d_pad, 2.0 * MASK_NEG, logits), dead


def _xl3_kernel(
    qc_ref, k_ref, v_ref, qv_ref, p_ref, pad_ref, seed_ref,
    out_ref, lse_ref, *, scale, tp, d_pad, t_kv, dropout_p,
):
    pos, _, _, j = _xl3_pos(qv_ref[0, 0], p_ref[0], tp, d_pad)
    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    logits, _ = _xl3_logits(s, pos, pad_ref[0, 0], j, scale, tp, d_pad)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    attn = e / jnp.maximum(l, 1e-30)
    if dropout_p > 0.0:
        tile_id = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        mask = _tile_dropout_mask(seed_ref, tile_id, (tp, tp), dropout_p)
        attn = attn * (mask * (1.0 / (1.0 - dropout_p)))
    out_ref[0, 0] = _dot(_mx(attn, v_ref), v_ref[0, 0]).astype(
        out_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(jnp.maximum(l, 1e-30))).astype(
        lse_ref.dtype)


def _xl3_bwd_kernel(
    qc_ref, k_ref, v_ref, qv_ref, p_ref, pad_ref,
    lse_ref, delta_ref, g_ref, seed_ref,
    dqc_ref, dk_ref, dv_ref, dqv_ref, dp_ref, dp_scr,
    *, scale, tp, d_pad, t_kv, dropout_p,
):
    # grid (H, B): b innermost so the per-head dp block is revisited
    # consecutively across the batch sweep
    ib, nb = pl.program_id(1), pl.num_programs(1)

    @pl.when(ib == 0)
    def _init():
        dp_scr[:] = jnp.zeros_like(dp_scr)

    qv, p = qv_ref[0, 0], p_ref[0]
    pos, sel_a, sel_b, j = _xl3_pos(qv, p, tp, d_pad)
    s = _dot_t(qc_ref[0, 0], k_ref[0, 0])
    logits, dead = _xl3_logits(s, pos, pad_ref[0, 0], j, scale, tp, d_pad)
    mask = None
    if dropout_p > 0.0:
        tile_id = ib * pl.num_programs(0) + pl.program_id(0)
        mask = _tile_dropout_mask(seed_ref, tile_id, (tp, tp), dropout_p)
    # inline _p_ds on the pre-masked two-tier logits
    keep = 1.0 - dropout_p
    p_sm = jnp.exp(logits - lse_ref[0, 0])
    dp_w = _dot_t(g_ref[0, 0], v_ref[0, 0])
    if mask is not None:
        dp_w = dp_w * (mask * (1.0 / keep))
    ds = p_sm * (dp_w - delta_ref[0, 0]) * scale
    ds = jnp.where(dead, 0.0, ds)
    p_v = p_sm if mask is None else p_sm * (mask * (1.0 / keep))
    dv_ref[0, 0] = _dot_0(_mx(p_v, g_ref), g_ref[0, 0]).astype(
        dv_ref.dtype)
    dqc_ref[0, 0] = _dot(_mx(ds, k_ref), k_ref[0, 0]).astype(dqc_ref.dtype)
    dk_ref[0, 0] = _dot_0(_mx(ds, qc_ref), qc_ref[0, 0]).astype(
        dk_ref.dtype)
    dx = _xl3_unshears(
        jnp.where(sel_a, ds, 0.0), jnp.where(sel_b, ds, 0.0), tp, d_pad
    )
    dqv_ref[0, 0] = _dot(_mx(dx, p), p).astype(dqv_ref.dtype)
    dp_scr[:] += _dot_0(_mx(dx, qv), qv)

    @pl.when(ib == nb - 1)
    def _emit():
        dp_ref[0] = dp_scr[:].astype(dp_ref.dtype)


def _xl3_pallas(qc, k, v, qv, p, pad, seed, *, scale, dropout_p, d_pad):
    B, H, T, D = qc.shape
    bh_spec = pl.BlockSpec((1, 1, T, D), lambda b, h: (b, h, 0, 0))
    kernel = functools.partial(
        _xl3_kernel, scale=float(scale), tp=T, d_pad=int(d_pad), t_kv=T,
        dropout_p=float(dropout_p),
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ],
        grid=(B, H),
        in_specs=[
            bh_spec, bh_spec, bh_spec, bh_spec,
            pl.BlockSpec((1, T, D), lambda b, h: (h, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b, h: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            bh_spec,
            pl.BlockSpec((1, 1, T, 1), lambda b, h: (b, h, 0, 0)),
        ],
    )(qc, k, v, qv, p, pad.reshape(B, 1, T), seed)


def _xl3_dense(qc, k, v, qv, p, pad, seed, *, scale, dropout_p=0.0,
               d_pad=0):
    """Dense oracle of the padded-table parameterisation (non-TPU
    fallback): same index map as the kernels, built with gathers."""
    B, H, T, D = qc.shape
    f32 = jnp.float32
    x = jnp.einsum("bhid,hcd->bhic", qv, p, preferred_element_type=f32)
    x2 = jnp.concatenate([x[:, :, 1:], jnp.zeros_like(x[:, :, :1])],
                         axis=2)
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    c_past = jnp.broadcast_to((j - i - 1) % T, (T, T))[None, None]
    c_fut = jnp.broadcast_to((j - i - 2 + d_pad) % T, (T, T))[None, None]
    s_past = jnp.take_along_axis(
        x, jnp.broadcast_to(c_past, x.shape), axis=-1
    )
    s_fut = jnp.take_along_axis(
        x2, jnp.broadcast_to(c_fut, x2.shape), axis=-1
    )
    pos = jnp.where(j <= i, s_past, jnp.where(j >= i + 2, s_fut, 0.0))
    content = jnp.einsum("bhqd,bhkd->bhqk", qc, k,
                         preferred_element_type=f32)
    logits = (content + pos) * scale
    logits = jnp.where(pad[:, None, None, :] > 0.5, MASK_NEG, logits)
    # two-tier tail masking (see _xl3_logits): wrapper-added tail keys
    # must vanish even from a fully-padded row's uniform fallback
    logits = jnp.where(j[None, None] >= T - d_pad, 2.0 * MASK_NEG, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)[..., None]
    if dropout_p > 0.0:
        attn = _dense_dropout(attn, seed, dropout_p)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                      preferred_element_type=f32), lse


def _xl3_bwd_pallas(qc, k, v, qv, p, pad, lse, delta, g, seed,
                    *, scale, dropout_p, d_pad):
    B, H, T, D = qc.shape
    bh_spec = pl.BlockSpec((1, 1, T, D), lambda h, b: (b, h, 0, 0))
    row_spec = pl.BlockSpec((1, 1, T, 1), lambda h, b: (b, h, 0, 0))
    p_spec = pl.BlockSpec((1, T, D), lambda h, b: (h, 0, 0))
    kernel = functools.partial(
        _xl3_bwd_kernel, scale=float(scale), tp=T, d_pad=int(d_pad),
        t_kv=T, dropout_p=float(dropout_p),
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
            jax.ShapeDtypeStruct((H, T, D), jnp.float32),
        ],
        grid=(H, B),
        in_specs=[
            bh_spec, bh_spec, bh_spec, bh_spec, p_spec,
            pl.BlockSpec((1, 1, T), lambda h, b: (b, 0, 0)),
            row_spec, row_spec, bh_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[bh_spec, bh_spec, bh_spec, bh_spec, p_spec],
        scratch_shapes=[pltpu.VMEM((T, D), jnp.float32)],
    )(qc, k, v, qv, p, pad.reshape(B, 1, T), lse, delta, g, seed)


def _xl3_bwd_dense(qc, k, v, qv, p, pad, lse, delta, g, seed,
                   *, scale, dropout_p=0.0, d_pad=0):
    _, vjp = jax.vjp(
        lambda *a: _xl3_dense(
            *a, pad, seed, scale=scale, dropout_p=dropout_p, d_pad=d_pad
        )[0],
        qc, k, v, qv, p,
    )
    return tuple(x.astype(jnp.float32) for x in vjp(g.astype(jnp.float32)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _xl3_op(qc, k, v, qv, p, pad, seed, scale, dropout_p, d_pad):
    return _dispatch(
        functools.partial(_xl3_pallas, d_pad=d_pad),
        functools.partial(_xl3_dense, d_pad=d_pad),
        (qc, k, v, qv, p, pad, seed), scale, dropout_p,
    )[0]


def _xl3_fwd(qc, k, v, qv, p, pad, seed, scale, dropout_p, d_pad):
    out, lse = _dispatch(
        functools.partial(_xl3_pallas, d_pad=d_pad),
        functools.partial(_xl3_dense, d_pad=d_pad),
        (qc, k, v, qv, p, pad, seed), scale, dropout_p,
    )
    return out, (qc, k, v, qv, p, pad, seed, out, lse)


def _xl3_bwd(scale, dropout_p, d_pad, res, g):
    qc, k, v, qv, p, pad, seed, out, lse = res
    delta = jnp.sum(g.astype(jnp.float32) * out, axis=-1, keepdims=True)
    g = g.astype(v.dtype)
    grads = _dispatch(
        functools.partial(_xl3_bwd_pallas, d_pad=d_pad),
        functools.partial(_xl3_bwd_dense, d_pad=d_pad),
        (qc, k, v, qv, p, pad, lse, delta, g, seed), scale, dropout_p,
    )
    grads = tuple(
        gr.astype(pr.dtype) for gr, pr in zip(grads, (qc, k, v, qv, p))
    )
    return (*grads, jnp.zeros_like(pad), _seed_cotangent(seed))


_xl3_op.defvjp(_xl3_fwd, _xl3_bwd)


def flash_xl3_attention(
    qc: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    qv: jnp.ndarray,
    p: jnp.ndarray,
    scale: float,
    pad_mask: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Projected-table XL flash attention (feature-last API).

    qc = q + u_bias, qv = q + v_bias: (B, T, H, D); p = pos_proj(table)
    reshaped (T, H, D) — the per-head projected position table (the D-wide
    contraction replaces xl/xl2's E-wide sinusoid lift; see the section
    comment).  The wrapper pads T to a lane multiple, LEFT-pads p's time
    axis (the shift's past index is end-anchored), and hands the future
    term's re-base constant to the kernels."""
    B, T, H, D = qc.shape
    cd = jnp.bfloat16 if qc.dtype == jnp.bfloat16 else jnp.float32
    hm = lambda x: jnp.transpose(x, (0, 2, 1, 3)).astype(cd)
    pad = (
        pad_mask.astype(jnp.float32)
        if pad_mask is not None
        else jnp.zeros((B, T), jnp.float32)
    )
    tp = _xl3_padded_time(T)
    d_pad = tp - T
    ph = jnp.transpose(p, (1, 0, 2)).astype(cd)  # (H, T, D)
    if d_pad:
        ext = lambda x: jnp.pad(x, ((0, 0), (0, d_pad), (0, 0), (0, 0)))
        qc, k, v, qv = map(ext, (qc, k, v, qv))
        ph = jnp.pad(ph, ((0, 0), (d_pad, 0), (0, 0)))
        pad = jnp.pad(pad, ((0, 0), (0, d_pad)), constant_values=1.0)
    seed = _zero_seed() if dropout_seed is None else dropout_seed
    ctx = _xl3_op(
        hm(qc), hm(k), hm(v), hm(qv), ph, pad, seed, float(scale),
        float(dropout_p), int(d_pad),
    )
    ctx = jnp.transpose(ctx, (0, 2, 1, 3))[:, :T]
    return ctx.reshape(B, T, H * D).astype(qc.dtype)


# --------------------------------------------------------------------------
# espnet "latest" rel-pos flavour (single rotated stream)
# --------------------------------------------------------------------------


def _rel_pallas(qc, k, v, g, table, pad, seed, *, scale, dropout_p):
    return _call_flash(
        _rel_kernel, [qc, g], [k], v, [table], pad, seed, scale, dropout_p
    )


def _rel_forward(qc, k, v, g, table, pad, seed, scale, dropout_p):
    return _dispatch(
        _rel_pallas, _rel_dense, (qc, k, v, g, table, pad, seed), scale,
        dropout_p,
    )


def _rel_dense(qc, k, v, g, table, pad, seed, *, scale, dropout_p=0.0):
    f32 = jnp.float32
    content = jnp.einsum("bhqd,bhkd->bhqk", qc, k,
                         preferred_element_type=f32)
    pos = jnp.einsum("bhqe,ke->bhqk", g, table, preferred_element_type=f32)
    logits = (content + pos) * scale
    logits = jnp.where(pad[:, None, None, :] > 0.5, MASK_NEG, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)[..., None]
    if dropout_p > 0.0:
        attn = _dense_dropout(attn, seed, dropout_p)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                      preferred_element_type=f32), lse


def _rel_bwd_pallas(qc, k, v, gp, table, pad, lse, delta, g, seed,
                    *, scale, dropout_p):
    B, H, T, D = qc.shape
    E = table.shape[-1]
    bq = bk = _block_size(T)
    pad3 = pad.reshape(B, 1, T)
    dqc, dgp = _call_bwd_q(
        _rel_bwd_q_kernel, [qc, gp], [k, v], [table], pad3, lse, delta,
        g, seed, scale, dropout_p, [D, E], bq, bk,
    )
    dk, dv, dtab = _call_bwd_kv(
        _rel_bwd_kv_kernel, [qc, gp], [k, v], [table], pad3, lse, delta,
        g, seed, scale, dropout_p, E, bq, bk,
    )
    return dqc, dk, dv, dgp, dtab


def _rel_bwd_dense(qc, k, v, gp, table, pad, lse, delta, g, seed,
                   *, scale, dropout_p=0.0):
    _, vjp = jax.vjp(
        lambda *a: _rel_dense(
            *a, pad, seed, scale=scale, dropout_p=dropout_p
        )[0],
        qc, k, v, gp, table,
    )
    return tuple(x.astype(jnp.float32) for x in vjp(g.astype(jnp.float32)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _rel_op(qc, k, v, g, table, pad, seed, scale, dropout_p):
    return _rel_forward(qc, k, v, g, table, pad, seed, scale, dropout_p)[0]


def _rel_fwd(qc, k, v, g, table, pad, seed, scale, dropout_p):
    out, lse = _rel_forward(qc, k, v, g, table, pad, seed, scale, dropout_p)
    return out, (qc, k, v, g, table, pad, seed, out, lse)


def _rel_bwd(scale, dropout_p, res, g_out):
    qc, k, v, gp, table, pad, seed, out, lse = res
    delta = jnp.sum(g_out.astype(jnp.float32) * out, axis=-1,
                    keepdims=True)
    g_out = g_out.astype(v.dtype)
    grads = _dispatch(
        _rel_bwd_pallas, _rel_bwd_dense,
        (qc, k, v, gp, table, pad, lse, delta, g_out, seed), scale,
        dropout_p,
    )
    grads = tuple(
        gr.astype(p.dtype) for gr, p in zip(grads, (qc, k, v, gp, table))
    )
    return (*grads, jnp.zeros_like(pad), _seed_cotangent(seed))


_rel_op.defvjp(_rel_fwd, _rel_bwd)


def flash_rel_attention(
    qc: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    g: jnp.ndarray,
    table: jnp.ndarray,
    scale: float,
    pad_mask: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """espnet 'latest' rel-pos flash attention (feature-last API).

    qc = q + pos_bias_u, g = the pre-rotated position-query stream
    (`ops/espnet_attention.py:rel_pos_queries`), table = the negative half
    of the symmetric rel table (t_{-j}, j = 0..T-1).  bf16 inputs stay
    bf16 through the MXU contractions (see ``flash_xl_attention``)."""
    B, T, H, D = qc.shape
    cd = jnp.bfloat16 if qc.dtype == jnp.bfloat16 else jnp.float32
    hm = lambda x: jnp.transpose(x, (0, 2, 1, 3)).astype(cd)
    pad = (
        pad_mask.astype(jnp.float32)
        if pad_mask is not None
        else jnp.zeros((B, T), jnp.float32)
    )
    tp = _padded_time(T)
    table = table.astype(cd)
    if tp != T:
        ext = lambda x: jnp.pad(x, ((0, 0), (0, tp - T), (0, 0), (0, 0)))
        qc, k, v, g = map(ext, (qc, k, v, g))
        table = jnp.pad(table, ((0, tp - T), (0, 0)))
        pad = jnp.pad(pad, ((0, 0), (0, tp - T)), constant_values=1.0)
    seed = _zero_seed() if dropout_seed is None else dropout_seed
    ctx = _rel_op(
        hm(qc), hm(k), hm(v), hm(g),
        table, pad, seed, float(scale), float(dropout_p),
    )
    ctx = jnp.transpose(ctx, (0, 2, 1, 3))[:, :T]
    return ctx.reshape(B, T, H * D).astype(qc.dtype)


# --------------------------------------------------------------------------
# plain scaled-dot flavour
# --------------------------------------------------------------------------


def _plain_pallas(q, k, v, pad, seed, *, scale, dropout_p):
    return _call_flash(
        _plain_kernel, [q], [k], v, [], pad, seed, scale, dropout_p
    )


def _plain_forward(q, k, v, pad, seed, scale, dropout_p):
    return _dispatch(
        _plain_pallas, _plain_dense, (q, k, v, pad, seed), scale, dropout_p
    )


def _plain_dense(q, k, v, pad, seed, *, scale, dropout_p=0.0):
    f32 = jnp.float32
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=f32) * scale
    logits = jnp.where(pad[:, None, None, :] > 0.5, MASK_NEG, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)[..., None]
    if dropout_p > 0.0:
        attn = _dense_dropout(attn, seed, dropout_p)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                      preferred_element_type=f32), lse


def _plain_bwd_pallas(q, k, v, pad, lse, delta, g, seed, *, scale,
                      dropout_p):
    B, H, T, D = q.shape
    bq = bk = _block_size(T)
    pad3 = pad.reshape(B, 1, T)
    (dq,) = _call_bwd_q(
        _plain_bwd_q_kernel, [q], [k, v], [], pad3, lse, delta,
        g, seed, scale, dropout_p, [D], bq, bk,
    )
    dk, dv = _call_bwd_kv(
        _plain_bwd_kv_kernel, [q], [k, v], [], pad3, lse, delta,
        g, seed, scale, dropout_p, 0, bq, bk,
    )
    return dq, dk, dv


def _plain_bwd_dense(q, k, v, pad, lse, delta, g, seed, *, scale,
                     dropout_p=0.0):
    _, vjp = jax.vjp(
        lambda *a: _plain_dense(
            *a, pad, seed, scale=scale, dropout_p=dropout_p
        )[0],
        q, k, v,
    )
    return tuple(x.astype(jnp.float32) for x in vjp(g.astype(jnp.float32)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _plain_op(q, k, v, pad, seed, scale, dropout_p):
    return _plain_forward(q, k, v, pad, seed, scale, dropout_p)[0]


def _plain_fwd(q, k, v, pad, seed, scale, dropout_p):
    out, lse = _plain_forward(q, k, v, pad, seed, scale, dropout_p)
    return out, (q, k, v, pad, seed, out, lse)


def _plain_bwd(scale, dropout_p, res, g_out):
    q, k, v, pad, seed, out, lse = res
    delta = jnp.sum(g_out.astype(jnp.float32) * out, axis=-1,
                    keepdims=True)
    g_out = g_out.astype(v.dtype)
    grads = _dispatch(
        _plain_bwd_pallas, _plain_bwd_dense,
        (q, k, v, pad, lse, delta, g_out, seed), scale, dropout_p,
    )
    grads = tuple(
        gr.astype(p.dtype) for gr, p in zip(grads, (q, k, v))
    )
    return (*grads, jnp.zeros_like(pad), _seed_cotangent(seed))


_plain_op.defvjp(_plain_fwd, _plain_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    pad_mask: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Plain scaled-dot MHA flash attention (feature-last API):
    q/k/v (B, T, H, D), pad_mask (B, T) True at padding keys; returns
    (B, T, H*D).  bf16 inputs stay bf16 through the MXU contractions
    (see ``flash_xl_attention``)."""
    B, T, H, D = q.shape
    cd = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    hm = lambda x: jnp.transpose(x, (0, 2, 1, 3)).astype(cd)
    pad = (
        pad_mask.astype(jnp.float32)
        if pad_mask is not None
        else jnp.zeros((B, T), jnp.float32)
    )
    tp = _padded_time(T)
    if tp != T:
        ext = lambda x: jnp.pad(x, ((0, 0), (0, tp - T), (0, 0), (0, 0)))
        q, k, v = map(ext, (q, k, v))
        pad = jnp.pad(pad, ((0, 0), (0, tp - T)), constant_values=1.0)
    seed = _zero_seed() if dropout_seed is None else dropout_seed
    ctx = _plain_op(hm(q), hm(k), hm(v), pad, seed, float(scale),
                    float(dropout_p))
    ctx = jnp.transpose(ctx, (0, 2, 1, 3))[:, :T]
    return ctx.reshape(B, T, H * D).astype(q.dtype)
