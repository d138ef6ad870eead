"""Matcha-TTS loss (`models/tts/matcha/loss.py`): CFM MSE + Gaussian prior
NLL + forward-sum/bin alignment + duration MSE + CVAE KL."""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from viet_tts_tpu.models.fastspeech2.loss import kl_divergence, linear_buildup
from viet_tts_tpu.ops import bin_loss, forward_sum_loss


class MatchaTTSLoss:
    def __init__(self, config: Dict[str, Any], is_finetune: bool = False):
        self.n_channels = config["n_channels"]
        self.linbuild = config["linbuild"]
        self.is_finetune = is_finetune
        self.bin_enable = config["binarization_loss_enable_steps"]
        self.bin_warmup = config["binarization_loss_warmup_steps"]

    def __call__(
        self,
        predictions: Tuple,
        targets: Tuple,
        is_joint: bool = False,
        step: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        (
            dec_outs,
            u,
            mu_y,
            txt_pad,
            mel_valid,
            feats_lengths,
            duration_targets,
            log_d_pred,
            attn_outs,
            accent_probs,
        ) = predictions
        feats, text_lengths = targets

        mask = None if is_joint else mel_valid[..., None].astype(dec_outs.dtype)
        if mask is None:
            mask = jnp.ones((dec_outs.shape[0], dec_outs.shape[1], 1), dec_outs.dtype)

        denom = mask.sum() * u.shape[-1]
        losses: Dict[str, jnp.ndarray] = {}
        losses["diff"] = (((dec_outs - u) ** 2) * mask).sum() / denom
        losses["prior"] = (
            (0.5 * ((feats - mu_y) ** 2 + math.log(2 * math.pi))) * mask
        ).sum() / (mask.sum() * self.n_channels)

        if step is not None and attn_outs is not None:
            if accent_probs is not None:
                if self.is_finetune:
                    L = 5e-4
                else:
                    lb = self.linbuild
                    L = linear_buildup(
                        step, lb["start"], lb["stop"], lb["n_up"], lb["n_stop"]
                    )
                mu_acc, logvar_acc, mu_spk, logvar_spk = accent_probs
                losses["cvae"] = L * (
                    kl_divergence(mu_acc, logvar_acc)
                    + kl_divergence(mu_spk, logvar_spk)
                )
            attn_soft, attn_hard, _, attn_logprob = attn_outs
            losses["ctc"] = forward_sum_loss(
                attn_logprob, text_lengths, feats_lengths
            )
            w = jnp.clip((step - self.bin_enable) / self.bin_warmup, 0.0, 1.0)
            w = jnp.where(step < self.bin_enable, 0.0, w)
            losses["bin"] = bin_loss(attn_hard, attn_soft) * w

            nonpad = (~txt_pad).astype(jnp.float32)
            d_target = duration_targets.astype(jnp.float32) * nonpad
            losses["dur"] = jnp.mean(
                (log_d_pred - jnp.log(d_target + 1.0)) ** 2
            )
        return losses
