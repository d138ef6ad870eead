"""AdaSpeech loss: FS2 loss + phoneme-latent distillation MSE
(`models/tts/adaspeech/loss.py`), with the avg_mel_phn term gated by the
distillation step like the reference trainer's None-check."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from viet_tts_tpu.models.fastspeech2.loss import FastSpeech2Loss, masked_mean


class AdaSpeechLoss(FastSpeech2Loss):
    def __init__(self, config, is_finetune: bool = False):
        super().__init__(config, is_finetune)
        self.phoneme_level_encoder_step = int(
            config.get("phoneme_level_encoder_step", 60000)
        )

    def __call__(
        self,
        predictions: Tuple,
        targets: Tuple,
        is_joint: bool = False,
        step: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        phn_pred = predictions[-1]
        phn_encode = targets[-1]
        base_preds = predictions[:-1] + (None,)  # keep the [: -1] slice shape
        losses = super().__call__(base_preds, targets[:-1], is_joint, step)
        if step is not None and phn_pred is not None and phn_encode is not None:
            import jax

            src_valid = ~predictions[6]
            err = (phn_pred - jax.lax.stop_gradient(phn_encode)) ** 2
            w = (step >= self.phoneme_level_encoder_step).astype(err.dtype)
            losses["avg_mel_phn"] = masked_mean(err, src_valid[..., None]) * w
        return losses
