"""VITS2 functional losses (`models/gan_tts/vits2/loss.py`)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def feature_loss(fmap_r: Sequence, fmap_g: Sequence) -> jnp.ndarray:
    """2 * sum of L1 between all real (detached) and fake feature maps."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(rl) - gl))
    return loss * 2.0


def discriminator_loss(
    disc_real: Sequence[jnp.ndarray], disc_gen: Sequence[jnp.ndarray]
) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg**2)
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs: Sequence[jnp.ndarray]):
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask) -> jnp.ndarray:
    """KL(q||p) per valid frame (`loss.py:43-58`); feature-last tensors."""
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)
