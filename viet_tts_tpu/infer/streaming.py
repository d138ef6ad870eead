"""Chunked streaming vocoder decode: first audio before the full decode.

The HiFi-GAN decode is ~82% of two-stage serving time (PERF_NOTES.md §1)
and is purely convolutional, so its receptive field is finite: decoding a
mel slice with ``context_frames`` of real context on each side reproduces
the full decode's samples exactly (up to float reassociation) for every
sample in the slice. That turns time-to-first-audio from
O(T_mel * hop) into O(chunk_frames * hop) — the serving latency lever for
long utterances, complementing `api.stream_long`'s sentence-level
streaming (reference has neither; its vocoder call is monolithic,
`models/gan_tts/hifigan/generator.py:132-156`).

Every window has the same static shape (edge windows are zero-padded, the
same values 'same'-padding would produce), so the chunk decode compiles
ONCE and is reused for all chunks and utterance lengths.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def stream_vocoder(
    vocoder_fn,
    vocoder_vars,
    mel,
    hop: int,
    chunk_frames: int = 64,
    context_frames: int = 32,
) -> Iterator[np.ndarray]:
    """Yield (B, chunk_frames*hop) waveform chunks for ``mel`` (B, T, C).

    ``vocoder_fn(vars, mel_window) -> wav (B, T_window*hop)`` must be the
    jitted vocoder; ``context_frames`` must cover the decoder's receptive
    field in mel frames (32 > HiFi-GAN V1's ~11-frame field; exactness is
    asserted in tests/test_streaming.py against the full decode).
    """
    import jax.numpy as jnp

    B, T, C = mel.shape
    ctx = context_frames
    padded = jnp.pad(mel, ((0, 0), (ctx, ctx + chunk_frames), (0, 0)))
    for t0 in range(0, T, chunk_frames):
        window = jnp.asarray(padded[:, t0 : t0 + chunk_frames + 2 * ctx])
        wav = vocoder_fn(vocoder_vars, window)
        got = np.asarray(wav[:, ctx * hop : (ctx + chunk_frames) * hop],
                         np.float32)
        n_valid = min(chunk_frames, T - t0) * hop
        yield got[:, :n_valid]
