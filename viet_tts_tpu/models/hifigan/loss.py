"""GAN losses: adversarial (mse/hinge), feature matching, mel-spectrogram.

Semantics parity with `models/gan_tts/hifigan/loss.py`. Pure functions over
lists of per-discriminator feature-map lists. The mel loss keeps the
reference quirk of defaulting to log10 mels (`hifigan_trainer.py:71-80`
leaves log_base at the espnet default 10.0 while preprocessing uses natural
log).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from viet_tts_tpu.dsp.stft import log_mel_spectrogram


def _last(outputs):
    return outputs[-1] if isinstance(outputs, (list, tuple)) else outputs


def generator_adversarial_loss(
    outputs: Sequence,
    average_by_discriminators: bool = False,
    loss_type: str = "mse",
) -> jnp.ndarray:
    """sum_d criterion(D_d(fake)) (`loss.py:20-77`)."""
    total = 0.0
    for o in outputs:
        o = _last(o)
        if loss_type == "mse":
            total = total + jnp.mean((o - 1.0) ** 2)
        else:  # hinge
            total = total - jnp.mean(o)
    if average_by_discriminators:
        total = total / len(outputs)
    return total


def discriminator_adversarial_loss(
    outputs_hat: Sequence,
    outputs: Sequence,
    average_by_discriminators: bool = False,
    loss_type: str = "mse",
):
    """Returns (real_loss, fake_loss) (`loss.py:80-155`)."""
    real = fake = 0.0
    for oh, o in zip(outputs_hat, outputs):
        oh, o = _last(oh), _last(o)
        if loss_type == "mse":
            real = real + jnp.mean((o - 1.0) ** 2)
            fake = fake + jnp.mean(oh**2)
        else:
            real = real - jnp.mean(jnp.minimum(o - 1.0, 0.0))
            fake = fake - jnp.mean(jnp.minimum(-oh - 1.0, 0.0))
    if average_by_discriminators:
        real = real / len(outputs)
        fake = fake / len(outputs)
    return real, fake


def feature_match_loss(
    feats_hat: Sequence,
    feats: Sequence,
    average_by_layers: bool = False,
    average_by_discriminators: bool = False,
    include_final_outputs: bool = True,
) -> jnp.ndarray:
    """L1 between fake/real feature maps (`loss.py:158-216`).
    Real maps are treated as constants by the caller (no grad flows into the
    discriminator from this term by construction of the gen-step grads)."""
    total = 0.0
    for fh, f in zip(feats_hat, feats):
        if not include_final_outputs:
            fh, f = fh[:-1], f[:-1]
        d_loss = 0.0
        for a, b in zip(fh, f):
            d_loss = d_loss + jnp.mean(jnp.abs(a - b))
        if average_by_layers:
            d_loss = d_loss / len(fh)
        total = total + d_loss
    if average_by_discriminators:
        total = total / len(feats)
    return total


class MelSpectrogramLoss:
    """L1 between log-mels of fake and real waveforms (`loss.py:219-295`)."""

    def __init__(
        self,
        fs: int = 22050,
        n_fft: int = 1024,
        hop_length: int = 256,
        win_length: Optional[int] = None,
        window: str = "hann",
        n_mels: int = 80,
        fmin: Optional[float] = 0.0,
        fmax: Optional[float] = None,
        log_base: Optional[float] = 10.0,
    ):
        self.kw = dict(
            sr=fs,
            n_fft=n_fft,
            hop_length=hop_length,
            win_length=win_length,
            window=window,
            n_mels=n_mels,
            fmin=fmin or 0.0,
            fmax=fmax,
            log_base=log_base,
        )

    def __call__(self, y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """y_hat, y: (B, T) or (B, T, 1) waveforms."""
        if y_hat.ndim == 3:
            y_hat, y = y_hat[..., 0], y[..., 0]
        mel_hat = log_mel_spectrogram(y_hat, **self.kw)
        mel = log_mel_spectrogram(y, **self.kw)
        return jnp.mean(jnp.abs(mel_hat - mel))
