"""JETS losses: variance (duration/pitch/energy) + forward-sum bundle.

Parity with `models/gan_tts/jets/loss.py`: masked-mean MSE over valid
tokens, duration loss in log domain with offset 1 (espnet
DurationPredictorLoss), forward-sum with the in-graph beta-binomial prior.
The adversarial/feature-match/mel components are shared with HiFi-GAN
(`viet_tts_tpu.models.hifigan.loss`); like the reference, the trainer calls
the sub-losses directly.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from viet_tts_tpu.nn.utils import valid_mask_from_lengths
from viet_tts_tpu.ops import beta_binomial_log_prior, jets_forward_sum_loss


def _masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = jnp.broadcast_to(mask, err.shape).astype(err.dtype)
    return (err * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def variance_loss(
    d_outs: jnp.ndarray,
    ds: jnp.ndarray,
    p_outs: jnp.ndarray,
    ps: jnp.ndarray,
    e_outs: jnp.ndarray,
    es: jnp.ndarray,
    ilens: jnp.ndarray,
    offset: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(duration, pitch, energy) losses (`jets/loss.py:76-161`)."""
    mask = valid_mask_from_lengths(ilens, ds.shape[1])
    log_ds = jnp.log(ds.astype(jnp.float32) + offset)
    dur = _masked_mean((d_outs - log_ds) ** 2, mask)
    pitch = _masked_mean((p_outs - ps) ** 2, mask[..., None])
    energy = _masked_mean((e_outs - es) ** 2, mask[..., None])
    return dur, pitch, energy


def forward_sum_with_prior(
    log_p_attn: jnp.ndarray, ilens: jnp.ndarray, olens: jnp.ndarray
) -> jnp.ndarray:
    """ForwardSum CTC with the beta-binomial prior added in-graph
    (`jets/loss.py:164-268`; prior computed batched instead of per-sample
    host loops with a shape cache)."""
    B, T_feats, T_text = log_p_attn.shape
    prior = beta_binomial_log_prior(ilens, olens, T_text, T_feats)
    return jets_forward_sum_loss(log_p_attn, ilens, olens, bb_prior=prior)
