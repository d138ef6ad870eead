"""Mel-cepstral distortion (MCD) + mel-distance evaluation.

Closes BASELINE.md's third target ("MCD parity vs reference outputs"):
given two aligned log-mel spectrograms (same frame rate / length — e.g. the
reference torch synthesis vs the imported-weight JAX synthesis of the same
sentence), report the standard MCD in dB.

MCD here is the DTW-free Kubichek formulation on mel cepstra obtained by an
orthonormal DCT-II of the log-mel bands (c0 excluded):

    MCD = (10 / ln 10) * sqrt(2 * sum_{k=1..K} (c_k^a - c_k^b)^2)

averaged over frames. The reference repo computes no objective metric
itself; this implements the community-standard measurement its README
quality claims imply.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_LOG10_SCALE = 10.0 / np.log(10.0)


def dct_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n_out, n_in) (scipy.fftpack.dct norm='ortho')."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    basis *= np.sqrt(2.0 / n_in)
    basis[0] *= np.sqrt(0.5)
    return basis.astype(np.float64)


def mel_cepstra(log_mel: np.ndarray, n_mcep: int = 13) -> np.ndarray:
    """(T, n_mels) log-mel -> (T, n_mcep) cepstra (c0 included at [:, 0])."""
    log_mel = np.asarray(log_mel, np.float64)
    basis = dct_matrix(log_mel.shape[-1], n_mcep)
    return log_mel @ basis.T


def mcd(
    mel_a: np.ndarray,
    mel_b: np.ndarray,
    n_mcep: int = 13,
    lengths: Optional[np.ndarray] = None,
) -> float:
    """Mean MCD (dB) between aligned log-mel spectrograms.

    Accepts (T, n_mels) or batched (B, T, n_mels) with optional per-item
    valid lengths.
    """
    mel_a = np.asarray(mel_a)
    mel_b = np.asarray(mel_b)
    assert mel_a.shape == mel_b.shape, (mel_a.shape, mel_b.shape)
    if mel_a.ndim == 2:
        mel_a, mel_b = mel_a[None], mel_b[None]
        lengths = None if lengths is None else np.asarray([lengths])
    total, count = 0.0, 0
    for b in range(mel_a.shape[0]):
        L = mel_a.shape[1] if lengths is None else int(lengths[b])
        ca = mel_cepstra(mel_a[b, :L], n_mcep)[:, 1:]  # exclude c0 (energy)
        cb = mel_cepstra(mel_b[b, :L], n_mcep)[:, 1:]
        d = _LOG10_SCALE * np.sqrt(2.0 * ((ca - cb) ** 2).sum(axis=-1))
        total += float(d.sum())
        count += L
    return total / max(count, 1)


def mel_l1(
    mel_a: np.ndarray, mel_b: np.ndarray, lengths: Optional[np.ndarray] = None
) -> float:
    """Mean absolute mel distance over valid frames (the reference's
    training-time mel loss metric, `models/tts/fastspeech2/loss.py`)."""
    mel_a = np.asarray(mel_a)
    mel_b = np.asarray(mel_b)
    if mel_a.ndim == 2:
        mel_a, mel_b = mel_a[None], mel_b[None]
        lengths = None if lengths is None else np.asarray([lengths])
    total, count = 0.0, 0
    for b in range(mel_a.shape[0]):
        L = mel_a.shape[1] if lengths is None else int(lengths[b])
        total += float(np.abs(mel_a[b, :L] - mel_b[b, :L]).sum())
        count += L * mel_a.shape[-1]
    return total / max(count, 1)
