"""Factorized espnet rel-pos attention scores (latest + legacy) for TPU.

The JETS stacks (`nn/espnet_conformer.py`, parity target espnet
`nets/pytorch_backend/conformer/encoder.py` as instantiated by
`models/gan_tts/jets/model.py:317-341`) compute their position score with
a padded-reshape relative shift, materialising extra (B, H, T, T) (or
(B, H, T, 2T-1)) copies on TPU.  Both flavours factorize into plain
matmuls via the sinusoid rotation identity
(`ops/xl_attention.py:rotate_pairs`):

- "latest" (`_rel_shift`): the shifted score reads the symmetric (2T-1)
  table at relative position i - j, so with g_i = K_h (q_i + pos_bias_v)
  pre-rotated by +i, score_pos[i, j] = rot(g_i, +i) . t_{-j} — ONE
  rotated stream against the negative half of the table, no select.
- "legacy" (`_legacy_rel_shift`): identical index map to the FS2 XL
  shift, so `ops/xl_attention.py:xl_pos_queries` applies unchanged with
  the positive interleaved table.

Exactness pinned in `tests/test_espnet_attention.py`.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from viet_tts_tpu.ops.xl_attention import rotate_pairs


def rel_pos_queries_latest(
    q_v: jnp.ndarray, pos_kernel: jnp.ndarray
) -> jnp.ndarray:
    """Fold linear_pos into the query side for the espnet 'latest' shift.

    q_v: (B, T, H, D) = q + pos_bias_v; pos_kernel: (E, H*D) flax Dense
    kernel of ``linear_pos``. Returns g: (B, T, H, E) rotated so that
    against the negative-half table (``neg_rel_table``)
    g_i . t_{-j} == (K_h q'_i) . PE(i - j) — the shifted position score."""
    B, T, H, D = q_v.shape
    E = pos_kernel.shape[0]
    k3 = pos_kernel.reshape(E, H, D)
    g = jnp.einsum("bthd,ehd->bthe", q_v, k3)
    idx = jnp.arange(T, dtype=jnp.float32)
    return rotate_pairs(g, idx, row_axis=-3)


def neg_rel_table(sym_table: jnp.ndarray) -> jnp.ndarray:
    """Key-side table for the factorized 'latest' score: rows for
    positions 0, -1, ..., -(T-1) of the symmetric (2T-1, E) table
    (`nn/espnet_conformer.py:rel_positional_table`, row c holds position
    T-1-c, so the negative half starts at row T-1)."""
    two_t_minus_1 = sym_table.shape[0]
    t = (two_t_minus_1 + 1) // 2
    return sym_table[t - 1 :]


def espnet_rel_scores_latest(
    qc: jnp.ndarray,
    k: jnp.ndarray,
    g: jnp.ndarray,
    neg_table: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """Dense factorized 'latest' logits: (B, H, T, T).

    qc = q + pos_bias_u (B, T, H, D); k (B, T, H, D); g from
    `rel_pos_queries_latest`; neg_table (T, E) from `neg_rel_table`."""
    content = jnp.einsum("bqhd,bkhd->bhqk", qc, k)
    pos = jnp.einsum("bqhe,ke->bhqk", g, neg_table)
    return (content + pos) * jnp.asarray(scale, content.dtype)
