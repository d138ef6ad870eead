"""FastSpeech2 training loss (jit-compatible dict-of-losses).

Semantics parity with `models/tts/fastspeech2/loss.py`: masked L1 mel (+
postnet), ForwardSum CTC + warmup-weighted binarization loss, phoneme /
word / sentence duration MSE in log domain, masked pitch/energy MSE, and a
linearly-built-up CVAE KL weight. All step-dependent schedules are traced
`jnp.where` expressions so the whole loss lives inside one jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from viet_tts_tpu.ops import aggregate_by_ids, bin_loss, forward_sum_loss


def masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``err`` over True positions of ``mask`` (broadcastable)."""
    mask = jnp.broadcast_to(mask, err.shape).astype(err.dtype)
    return (err * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def kl_divergence(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """mean_b 0.5 * sum_d (e^logvar + mu^2 - 1 - logvar)
    (`loss.py:248-250`)."""
    return jnp.mean(0.5 * jnp.sum(jnp.exp(logvar) + mu**2 - 1.0 - logvar, axis=1))


def linear_buildup(step, start, stop, n_up, n_stop):
    """Traced equivalent of the precomputed schedule at `loss.py:241-246`."""
    frac = jnp.clip((step - n_up) / max(n_stop - n_up, 1), 0.0, 1.0)
    return start + (stop - start) * frac


class FastSpeech2Loss:
    """Callable loss bundle. ``config`` is the task's train.loss section plus
    pitch/energy feature levels."""

    def __init__(self, config: Dict[str, Any], is_finetune: bool = False):
        self.linbuild = config["linbuild"]
        self.is_finetune = is_finetune
        self.bin_enable = config["binarization_loss_enable_steps"]
        self.bin_warmup = config["binarization_loss_warmup_steps"]
        self.dur_lambda = config["dur_loss_lambda"]
        self.pitch_level = config.get("pitch_feature_level", "phoneme_level")
        self.energy_level = config.get("energy_feature_level", "phoneme_level")

    def _duration_losses(self, log_d_pred, d_target, word_ids, n_words, valid_mask):
        losses = {}
        nonpad = valid_mask.astype(jnp.float32)
        d_target = d_target.astype(jnp.float32) * nonpad
        d_pred = jnp.maximum(jnp.exp(log_d_pred) - 1.0, 0.0)

        log_d_target = jnp.log(d_target + 1.0)
        losses["pdur"] = jnp.mean((log_d_pred - log_d_target) ** 2)

        if self.dur_lambda.get("wdur", 0) > 0 and word_ids is not None:
            wd_pred = aggregate_by_ids(d_pred, word_ids, n_words)
            wd_target = aggregate_by_ids(d_target, word_ids, n_words)
            err = (jnp.log(wd_pred + 1.0) - jnp.log(wd_target + 1.0)) ** 2
            losses["wdur"] = masked_mean(err, wd_pred > 0)
        if self.dur_lambda.get("sdur", 0) > 0:
            sp, st = d_pred.sum(-1), d_target.sum(-1)
            losses["sdur"] = jnp.mean((jnp.log(sp + 1.0) - jnp.log(st + 1.0)) ** 2)
        return losses

    def _align_losses(self, attn_outs, src_lens, feats_lens, step):
        attn_soft, attn_hard, _, attn_logprob = attn_outs
        losses = {
            "ctc": forward_sum_loss(attn_logprob, src_lens, feats_lens)
        }
        w = jnp.clip((step - self.bin_enable) / self.bin_warmup, 0.0, 1.0)
        w = jnp.where(step < self.bin_enable, 0.0, w)
        losses["bin"] = bin_loss(attn_hard, attn_soft) * w
        return losses

    def _cvae_loss(self, probs, step):
        mu_acc, logvar_acc, mu_spk, logvar_spk = probs
        if self.is_finetune:
            L = 5e-4
        else:
            lb = self.linbuild
            L = linear_buildup(step, lb["start"], lb["stop"], lb["n_up"], lb["n_stop"])
        return {"cvae": L * (kl_divergence(mu_acc, logvar_acc) + kl_divergence(mu_spk, logvar_spk))}

    def __call__(
        self,
        predictions: Tuple,
        targets: Tuple,
        is_joint: bool = False,
        step: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        (
            feats_pred,
            postnet_pred,
            log_d_pred,
            pitch_pred,
            energy_pred,
            src_lens,
            src_pad,
            feats_lens,
            feats_pad,
            accent_probs,
            attn_outs,
        ) = predictions[:-1]
        feats_target, word_ids, n_words, d_target, pitch_target, energy_target = targets

        src_valid = ~src_pad
        feats_valid = ~feats_pad
        feats_target = feats_target[:, : feats_valid.shape[1], :]

        losses: Dict[str, jnp.ndarray] = {}
        mel_mask = None if is_joint else feats_valid[..., None]
        if mel_mask is None:
            losses["feat"] = jnp.mean(jnp.abs(feats_pred - feats_target))
            if postnet_pred is not None:
                losses["feat_postnet"] = jnp.mean(jnp.abs(postnet_pred - feats_target))
        else:
            losses["feat"] = masked_mean(jnp.abs(feats_pred - feats_target), mel_mask)
            if postnet_pred is not None:
                losses["feat_postnet"] = masked_mean(
                    jnp.abs(postnet_pred - feats_target), mel_mask
                )

        if step is not None:
            if attn_outs is not None:
                losses.update(self._align_losses(attn_outs, src_lens, feats_lens, step))
            if accent_probs is not None:
                losses.update(self._cvae_loss(accent_probs, step))
            losses.update(
                self._duration_losses(log_d_pred, d_target, word_ids,
                                      word_ids.shape[1] if word_ids is not None else 0,
                                      src_valid)
            )
            pe_mask = src_valid if self.pitch_level == "phoneme_level" else feats_valid
            losses["pitch"] = masked_mean((pitch_pred - pitch_target) ** 2, pe_mask)
            pe_mask = src_valid if self.energy_level == "phoneme_level" else feats_valid
            losses["energy"] = masked_mean((energy_pred - energy_target) ** 2, pe_mask)

        return losses


def total_loss(losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Plain sum of all loss entries (`fastspeech2_trainer.py:135`)."""
    return sum(losses.values())
