"""Shared helpers for neural blocks: positions, masks."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sinusoid_position_table(n_position: int, d_hid: int) -> np.ndarray:
    """Classic fixed sinusoid table (FastSpeech2 style), shape (n_position, d_hid).

    angle(pos, i) = pos / 10000^(2*(i//2)/d_hid); even dims sin, odd cos.
    (role of `models/tts/fastspeech2/blocks/utils.py` get_sinusoid_encoding_table)
    """
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    i = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (i // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def pad_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at PADDING positions (the reference's make_pad_mask convention)."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def valid_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at VALID positions."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]
