"""Batched monotonic alignment search (MAS) on device.

The reference crosses device->CPU->numba->device every training step for
FastSpeech2/AdaSpeech/Matcha (`models/tts/fastspeech2/function.py:127-168`,
called from `layers.py:133-143`), per-sample for JETS
(`models/gan_tts/jets/alignments.py:62-124`), and uses espnet's Cython
`maximum_path` for VITS2 (`models/gan_tts/vits2/generator.py:200`). All four
consumers share one Viterbi DP; here it is a single jit-compatible
`lax.scan` over mel frames, vectorised over batch x text — no host round
trips, no per-sample Python loops.

DP (identical to both reference formulations, which are transposes of each
other): path starts at (mel 0, text 0), ends at (mel_len-1, text_len-1), and
the text index advances by 0 or 1 per mel frame. Ties prefer the advance
(the reference's `>=` comparisons in `mas_width1` and
`_monotonic_alignment_search` backtracking).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Large-negative instead of -inf so sums/compares never produce NaN.
NEG = -1.0e30


def monotonic_alignment(
    log_attn: jnp.ndarray,
    text_lens: jnp.ndarray,
    mel_lens: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hard monotonic path through a batched log-score matrix.

    Args:
        log_attn: (B, T_mel, T_text) log scores (any real values).
        text_lens: (B,) valid text lengths.
        mel_lens: (B,) valid mel lengths.

    Returns:
        path: (B, T_mel, T_text) float32 0/1 matrix, zero outside the valid
            (mel_lens x text_lens) region.
        durations: (B, T_text) = per-token frame counts (path column sums).
    """
    B, T_mel, T_text = log_attn.shape
    text_lens = text_lens.astype(jnp.int32)
    mel_lens = mel_lens.astype(jnp.int32)

    col = jnp.arange(T_text, dtype=jnp.int32)
    text_mask = col[None, :] < text_lens[:, None]  # (B, T_text)
    scores = jnp.where(text_mask[:, None, :], log_attn.astype(jnp.float32), NEG)

    # Frame 0 must sit on text 0.
    row0 = jnp.where(col[None, :] == 0, scores[:, 0, :], NEG)

    def forward(lp, score_i):
        shifted = jnp.concatenate(
            [jnp.full((B, 1), NEG, lp.dtype), lp[:, :-1]], axis=1
        )
        advance = shifted >= lp  # tie prefers the advance
        lp = score_i + jnp.where(advance, shifted, lp)
        # Keep magnitudes bounded over long scans.
        lp = jnp.maximum(lp, NEG)
        return lp, advance

    # scores for frames 1..T_mel-1, scanned over the mel axis. The DP is
    # order-dependent so the scan stays serial, but the carry is tiny
    # ((B, T_text) floats) and each iteration is latency- not compute-bound
    # on TPU (PERF_NOTES.md §2); unrolling fuses 8 frame updates into one
    # loop body so intermediates stay in VMEM instead of round-tripping HBM
    # 8x, and the while-loop bookkeeping amortizes.
    _, advances = jax.lax.scan(
        forward, row0, jnp.swapaxes(scores[:, 1:, :], 0, 1), unroll=8
    )
    # advance[i] says whether frame i came from text j-1 at frame i-1.
    advances = jnp.concatenate(
        [jnp.zeros((1, B, T_text), bool), advances], axis=0
    )  # (T_mel, B, T_text)

    batch_idx = jnp.arange(B)

    def backward(j, inputs):
        adv_i, i = inputs
        at_end = i == (mel_lens - 1)
        j = jnp.where(at_end, text_lens - 1, j)
        valid = i < mel_lens
        emit = (col[None, :] == j[:, None]) & valid[:, None]
        moved = adv_i[batch_idx, jnp.clip(j, 0, T_text - 1)]
        j_prev = jnp.where(valid, j - moved.astype(jnp.int32), j)
        return j_prev, emit

    init_j = text_lens - 1
    _, path_rev = jax.lax.scan(
        backward,
        init_j,
        (advances[::-1], jnp.arange(T_mel - 1, -1, -1)),
        unroll=8,
    )
    path = jnp.swapaxes(path_rev[::-1], 0, 1).astype(jnp.float32)
    durations = path.sum(axis=1)
    return jax.lax.stop_gradient(path), jax.lax.stop_gradient(durations)


def binarize_attention(
    attn: jnp.ndarray, in_lens: jnp.ndarray, out_lens: jnp.ndarray
) -> jnp.ndarray:
    """FastSpeech2-style binarization of soft attention probabilities.

    Args:
        attn: (B, 1, T_mel, T_text) attention probabilities.
        in_lens: (B,) text lengths. out_lens: (B,) mel lengths.

    Returns (B, 1, T_mel, T_text) hard 0/1 alignment
    (role of `function.py:158-168` b_mas).
    """
    log_attn = jnp.log(jnp.maximum(attn[:, 0], 1e-30))
    path, _ = monotonic_alignment(log_attn, in_lens, out_lens)
    return path[:, None]


def viterbi_decode(
    log_p_attn: jnp.ndarray,
    text_lens: jnp.ndarray,
    feats_lens: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """JETS duration extraction + binarization loss.

    Args:
        log_p_attn: (B, T_feats, T_text) log attention probabilities.

    Returns:
        ds: (B, T_text) durations. bin_loss: scalar
        -mean_b mean_t log_p_attn[t, path(t)]
        (role of `jets/alignments.py:95-124`).
    """
    path, ds = monotonic_alignment(log_p_attn, text_lens, feats_lens)
    per_frame = (path * log_p_attn).sum(axis=(1, 2))
    bin_loss = -(per_frame / jnp.maximum(feats_lens, 1)).mean()
    return ds, bin_loss


def maximum_path(
    neg_cent: jnp.ndarray, text_lens: jnp.ndarray, mel_lens: jnp.ndarray
) -> jnp.ndarray:
    """VITS-layout MAS: scores and path shaped (B, T_text, T_mel)."""
    path, _ = monotonic_alignment(
        jnp.swapaxes(neg_cent, 1, 2), text_lens, mel_lens
    )
    return jnp.swapaxes(path, 1, 2)
