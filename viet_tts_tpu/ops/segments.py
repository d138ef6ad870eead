"""Windowed segment extraction for GAN training.

Equivalents of espnet's `get_random_segments` / `get_segments` used by the
reference for HiFi-GAN/JETS segment slicing (`jets_trainer.py:147-151`,
`hifigan_loader.py:83-92`, `jets/model.py:624-630`). Implemented with
per-sample `dynamic_slice` under vmap — static output shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def get_segments(
    x: jnp.ndarray, start_idxs: jnp.ndarray, segment_size: int
) -> jnp.ndarray:
    """Slice (B, C, T) at per-sample starts -> (B, C, segment_size)."""

    def slice_one(xb, s):
        return jax.lax.dynamic_slice_in_dim(xb, s, segment_size, axis=-1)

    return jax.vmap(slice_one)(x, start_idxs.astype(jnp.int32))


def get_random_segments(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    segment_size: int,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random per-sample windows of (B, C, T).

    Returns (segments, start_idxs); starts are uniform in
    [0, max(length - segment_size, 0)].
    """
    B = x.shape[0]
    max_start = jnp.maximum(lengths - segment_size, 0).astype(jnp.float32)
    u = jax.random.uniform(rng, (B,))
    start_idxs = (u * max_start).astype(jnp.int32)
    return get_segments(x, start_idxs, segment_size), start_idxs
