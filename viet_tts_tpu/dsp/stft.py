"""Jit-compilable STFT / spectrogram / log-mel features.

One implementation serves offline preprocessing, the in-training
mel-spectrogram loss, and VITS2's in-loop re-extraction. Numerical semantics
follow the reference's espnet frontend (in-repo copy at
`models/gan_tts/hifigan/loss.py:298-388`):

- framing: centered, reflect-padded, periodic Hann window (torch.stft defaults)
- amplitude = sqrt(clamp(re^2 + im^2, 1e-10))
- mel basis: Slaney-scale, Slaney-normalised triangles (librosa.filters.mel
  with htk=False), fmin=0, fmax=sr/2 when unset
- log-mel = log(clamp(mel, 1e-10)) in natural log when ``log_base`` is null
  (`config/preprocessing_config.yaml:14`), else divided by log(base).

All functions take time-domain audio shaped (..., T) and return (..., frames,
bins); everything is static-shape and differentiable.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1.0e-10


def hann_window(win_length: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """Hann window; periodic=True matches torch.hann_window."""
    n = win_length + 1 if periodic else win_length
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1)))
    return w[:win_length].astype(dtype)


@functools.lru_cache(maxsize=8)
def _window_constant(window: str, win_length: int, n_fft: int) -> np.ndarray:
    if window in (None, "none"):
        w = np.ones(win_length, dtype=np.float32)
    elif window == "hann":
        w = hann_window(win_length)
    else:
        raise ValueError(f"unsupported window: {window}")
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    return w


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, f / f_sp)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Slaney-normalised triangular mel filterbank, shape (n_freq, n_mels)."""
    if fmax is None:
        fmax = sr / 2.0
    n_freq = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freq)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalisation.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_freq, n_mels)


def frame_signal(
    x: jnp.ndarray, n_fft: int, hop_length: int, center: bool = True
) -> jnp.ndarray:
    """Slice (..., T) into overlapping frames (..., n_frames, n_fft)."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    )
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT of (..., T) -> (..., n_frames, n_fft//2+1)."""
    win_length = win_length or n_fft
    w = jnp.asarray(_window_constant(window, win_length, n_fft))
    frames = frame_signal(x, n_fft, hop_length, center=center)
    return jnp.fft.rfft(frames * w, n=n_fft, axis=-1)


def spectrogram_amplitude(spec: jnp.ndarray) -> jnp.ndarray:
    """Amplitude with the espnet clamp: sqrt(max(|S|^2, 1e-10))."""
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(jnp.maximum(power, EPS))


def linear_spectrogram(x: jnp.ndarray, cfg: dict) -> jnp.ndarray:
    """Amplitude spectrogram, (..., frames, n_fft//2+1)."""
    s = stft(
        x,
        n_fft=cfg["stft"]["filter_length"],
        hop_length=cfg["stft"]["hop_length"],
        win_length=cfg["stft"]["win_length"],
        window=cfg["stft"]["window"],
    )
    return spectrogram_amplitude(s)


def log_spectrogram(x: jnp.ndarray, cfg: dict) -> jnp.ndarray:
    """Natural-log amplitude spectrogram."""
    return jnp.log(jnp.maximum(linear_spectrogram(x, cfg), EPS))


def apply_log(x: jnp.ndarray, log_base: Optional[float]) -> jnp.ndarray:
    y = jnp.log(jnp.maximum(x, EPS))
    if log_base is not None:
        y = y / np.log(log_base)
    return y


def log_mel_spectrogram(
    x: jnp.ndarray,
    sr: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: Optional[int] = None,
    window: str = "hann",
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    log_base: Optional[float] = None,
) -> jnp.ndarray:
    """Log-mel features of (..., T) -> (..., frames, n_mels)."""
    amp = spectrogram_amplitude(
        stft(x, n_fft=n_fft, hop_length=hop_length, win_length=win_length, window=window)
    )
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = amp @ basis
    return apply_log(mel, log_base)


def log_mel_from_config(x: jnp.ndarray, cfg: dict) -> jnp.ndarray:
    """Log-mel using the merged preprocessing config (``conf["audio"]``)."""
    return log_mel_spectrogram(
        x,
        sr=cfg["signal"]["sampling_rate"],
        n_fft=cfg["stft"]["filter_length"],
        hop_length=cfg["stft"]["hop_length"],
        win_length=cfg["stft"]["win_length"],
        window=cfg["stft"]["window"],
        n_mels=cfg["mel"]["channels"],
        fmin=cfg["mel"]["fmin"] or 0.0,
        fmax=cfg["mel"]["fmax"],
        log_base=cfg["mel"]["log_base"],
    )


def frame_energy(x: jnp.ndarray, cfg: dict) -> jnp.ndarray:
    """Per-frame energy: sqrt(sum over freq of |S|^2), espnet Energy semantics."""
    s = stft(
        x,
        n_fft=cfg["stft"]["filter_length"],
        hop_length=cfg["stft"]["hop_length"],
        win_length=cfg["stft"]["win_length"],
        window=cfg["stft"]["window"],
    )
    power = jnp.real(s) ** 2 + jnp.imag(s) ** 2
    return jnp.sqrt(jnp.maximum(power.sum(axis=-1), EPS))


def num_frames(n_samples: int, hop_length: int) -> int:
    """Frame count of a centered STFT."""
    return 1 + n_samples // hop_length
