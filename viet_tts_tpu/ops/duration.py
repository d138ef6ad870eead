"""Duration-driven expansion / aggregation ops, all static-shape.

TPU-first replacements for the reference's `repeat_interleave` length
regulator (`models/tts/fastspeech2/layers.py:410-462`), Gaussian upsampling
(`layers.py:465-520`), numba `average_by_duration`
(`jets/alignments.py:127-165`), CPU-round-trip phoneme-level averaging
(`fastspeech2/function.py:185-214`), and the Python-loop `phone2words`
(`function.py:171-183`). Everything here is comparisons + matmuls/gathers,
ideal for the VPU/MXU, and differentiable where the reference is.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def duration_to_index(ds: jnp.ndarray, t_frames: int) -> jnp.ndarray:
    """Frame -> token index map. ds: (B, N) int durations -> (B, t_frames).

    Frame t belongs to token n iff cumsum[n-1] <= t < cumsum[n]; frames past
    the total duration clamp to the last token (masked by callers).
    """
    cum = jnp.cumsum(ds.astype(jnp.int32), axis=-1)  # (B, N)
    t = jnp.arange(t_frames, dtype=jnp.int32)
    # count of tokens fully consumed before frame t
    idx = (t[None, :, None] >= cum[:, None, :]).sum(axis=-1)
    return jnp.clip(idx, 0, ds.shape[-1] - 1)


def length_regulator(
    hs: jnp.ndarray,
    ds: jnp.ndarray,
    t_frames: int,
    pad_value: float = 0.0,
) -> jnp.ndarray:
    """Expand token states (B, N, C) to frames (B, t_frames, C) by duration.

    Gather-based: one comparison matrix + one take_along_axis — no
    `repeat_interleave`, no dynamic shapes. Frames beyond sum(ds) get
    ``pad_value``.
    """
    idx = duration_to_index(ds, t_frames)  # (B, T)
    out = jnp.take_along_axis(hs, idx[..., None], axis=1)
    total = ds.sum(axis=-1, keepdims=True)  # (B, 1)
    mask = jnp.arange(t_frames)[None, :] < total
    if pad_value == 0.0:
        return out * mask[..., None]
    return jnp.where(mask[..., None], out, pad_value)


def gaussian_upsample(
    hs: jnp.ndarray,
    ds: jnp.ndarray,
    h_masks: Optional[jnp.ndarray] = None,
    d_masks: Optional[jnp.ndarray] = None,
    delta: float = 0.1,
    t_frames: Optional[int] = None,
) -> jnp.ndarray:
    """Gaussian upsampling (arXiv:2010.04301), espnet semantics.

    Args:
        hs: (B, N, C) token states. ds: (B, N) durations (float ok).
        h_masks: (B, T) frame validity (bool). d_masks: (B, N) token validity.
        t_frames: static output length; required when h_masks is None.

    Returns (B, T, C).
    """
    if h_masks is not None:
        T = h_masks.shape[-1]
        t = jnp.arange(T, dtype=jnp.float32)[None, :] * h_masks.astype(
            jnp.float32
        )
    else:
        assert t_frames is not None, "need static t_frames without h_masks"
        T = t_frames
        t = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.float32)[None, :], (ds.shape[0], T)
        )

    c = jnp.cumsum(ds, axis=-1) - ds / 2.0  # (B, N) segment centres
    energy = -delta * (t[:, :, None] - c[:, None, :]) ** 2  # (B, T, N)
    if d_masks is not None:
        energy = jnp.where(d_masks[:, None, :], energy, -jnp.inf)
    p_attn = jnp.exp(
        energy - jnp.max(energy, axis=2, keepdims=True)
    )
    p_attn = p_attn / jnp.maximum(p_attn.sum(axis=2, keepdims=True), 1e-20)
    return p_attn @ hs


def average_by_duration(
    ds: jnp.ndarray,
    xs: jnp.ndarray,
    text_lens: Optional[jnp.ndarray] = None,
    feats_lens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean of frame features per token segment.

    Args:
        ds: (B, N) int durations. xs: (B, T) frame-level values.

    Returns (B, N): mean over each token's frame span; 0 for zero-duration
    tokens (role of `jets/alignments.py:127-165` and
    `function.py:185-214`).
    """
    B, N = ds.shape
    T = xs.shape[1]
    ds = ds.astype(jnp.int32)
    if text_lens is not None:
        ds = ds * (jnp.arange(N)[None, :] < text_lens[:, None])
    cum = jnp.cumsum(ds, axis=-1)
    start = cum - ds
    t = jnp.arange(T, dtype=jnp.int32)
    seg = (t[None, None, :] >= start[:, :, None]) & (
        t[None, None, :] < cum[:, :, None]
    )  # (B, N, T)
    if feats_lens is not None:
        seg = seg & (t[None, None, :] < feats_lens[:, None, None])
    sums = jnp.einsum("bnt,bt->bn", seg.astype(xs.dtype), xs)
    counts = seg.sum(axis=-1)
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), 0.0)


def expand_path_average(
    path: jnp.ndarray, xs: jnp.ndarray
) -> jnp.ndarray:
    """Token means directly from a hard alignment path (B, T, N)."""
    sums = jnp.einsum("btn,bt->bn", path, xs)
    counts = path.sum(axis=1)
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)


def aggregate_by_ids(
    x: jnp.ndarray,
    ids: jnp.ndarray,
    num_segments: int,
    mode: str = "sum",
) -> jnp.ndarray:
    """Segment-aggregate (B, N) values by per-position segment ids.

    ids: (B, N) int, -1 marks padding (dropped). Used for word-level
    duration sums (`function.py:171-183` phone2words) with ids built by the
    collate from boundary lists.
    """
    valid = ids >= 0
    safe = jnp.where(valid, ids, 0)
    onehot = jax.nn.one_hot(safe, num_segments, dtype=x.dtype) * valid[
        ..., None
    ].astype(x.dtype)
    sums = jnp.einsum("bnw,bn->bw", onehot, x)
    if mode == "sum":
        return sums
    counts = jnp.einsum("bnw->bw", onehot)
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)
