"""Vocoder (HiFi-GAN) dataset: waveform + mel, random aligned segments.

Role of `src/tools/dataloader/hifigan_loader.py` with its shipped defects
fixed (the reference constructs the collate with swapped arguments and reads
a "semb" key the dataset never emits). Segments are a fixed size, so every
batch is already static-shape — no buckets needed.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from viet_tts_tpu.data.features import load_array, resolve_artifact
from viet_tts_tpu.dsp.audio import peak_normalize


class VocoderDataset:
    """Items: full waveform + log-mel (computed on the fly if not cached)."""

    def __init__(self, filelist: List[tuple], config: dict):
        self.inputs = list(filelist)
        self.config = config
        self.sr = config["signal"]["sampling_rate"]

    def __len__(self):
        return len(self.inputs)

    def __getitem__(self, index: int) -> dict:
        from viet_tts_tpu.runtime import native

        wav_path = self.inputs[index][0]
        audio, sr = native.wav_read_f32(wav_path)
        assert sr == self.sr, f"{sr} != {self.sr}"
        audio = peak_normalize(audio, 0.95)

        cached = resolve_artifact(wav_path, "feat")
        if cached is not None:
            mel = load_array(cached).astype(np.float32)
            if mel.shape[0] == self.config["mel"]["channels"]:
                mel = mel.T
        else:
            import jax.numpy as jnp

            from viet_tts_tpu.dsp import log_mel_from_config

            mel = np.asarray(
                log_mel_from_config(jnp.asarray(audio)[None], self.config)
            )[0]
        return dict(speech=audio.astype(np.float32), melspec=mel)


class VocoderSegmentCollate:
    """Random aligned (mel, waveform) segments -> static (B, S, 80)/(B, S*256, 1)."""

    def __init__(self, segment_size: int = 64, upsample_factor: int = 256, seed: int = 0):
        self.segment_size = segment_size
        self.upsample_factor = upsample_factor
        self.rng = np.random.RandomState(seed)

    def __call__(self, items: List[dict]) -> Dict[str, np.ndarray]:
        B = len(items)
        S, U = self.segment_size, self.upsample_factor
        mel = np.zeros((B, S, items[0]["melspec"].shape[1]), np.float32)
        wav = np.zeros((B, S * U, 1), np.float32)
        for i, it in enumerate(items):
            m, a = it["melspec"], it["speech"]
            n_frames = min(m.shape[0], len(a) // U)
            if n_frames <= S:
                mel[i, :n_frames] = m[:n_frames]
                seg = a[: n_frames * U]
                wav[i, : len(seg), 0] = seg
            else:
                start = self.rng.randint(0, n_frames - S + 1)
                mel[i] = m[start : start + S]
                wav[i, :, 0] = a[start * U : (start + S) * U]
        return {"mel": mel, "speech": wav}


class VocoderBatcher:
    """Shuffled fixed-size batches over the dataset."""

    def __init__(self, dataset, batch_size: int, collate, seed: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch

    def __iter__(self):
        from viet_tts_tpu.data.batching import prefetched

        return prefetched(self._generate, self.prefetch)

    def _generate(self):
        order = self.rng.permutation(len(self.dataset))
        buf = []
        for idx in order:
            buf.append(self.dataset[int(idx)])
            if len(buf) == self.batch_size:
                yield self.collate(buf)
                buf = []
        if buf:
            while len(buf) < self.batch_size:
                buf.append(buf[len(buf) % max(len(buf), 1)])
            yield self.collate(buf)

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size
