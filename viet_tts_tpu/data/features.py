"""Offline feature-cache builder (host side, runs once per dataset).

Same artifact layout as the reference's `prepare_inputs`
(`src/tools/tools_for_data.py:130-218`) so datasets interchange:

    <speaker>/wavs/x.wav
    <speaker>/feats/x.npy       log-mel (T, n_mels)
    <speaker>/pitch/x.npy       log-F0 per frame (T,)
    <speaker>/energy/x.npy      frame energy (T,)
    <speaker>/alignment/x.npy   beta-binomial prior (T, n_phones)
    <speaker>/duration/x.txt    per-phoneme frame counts (supervised mode)
    <speaker>/embedding/x.npy   optional external speaker embedding

Artifacts are .npy; .pt files produced by the reference are read
transparently when present (torch is a host-side convenience only).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from viet_tts_tpu.dsp import (
    frame_energy,
    log_mel_from_config,
    read_wav,
)
from viet_tts_tpu.dsp.dio import extract_f0_dio
from viet_tts_tpu.dsp.pitch import extract_f0
from viet_tts_tpu.ops.prior import beta_binomial_prior

ARTIFACTS = ("feat", "pitch", "energy", "alignment", "duration", "embedding")
_DIRS = {
    "feat": "feats",
    "pitch": "pitch",
    "energy": "energy",
    "alignment": "alignment",
    "duration": "duration",
    "embedding": "embedding",
}


def load_array(path: str) -> np.ndarray:
    """Load .npy, or a reference-produced .pt tensor."""
    if path.endswith(".pt"):
        import torch

        return torch.load(path, map_location="cpu", weights_only=False).numpy()
    return np.load(path)


def _artifact_path(wav_path: str, kind: str) -> str:
    root = os.path.dirname(os.path.dirname(wav_path))
    stem = ".".join(os.path.basename(wav_path).split(".")[:-1])
    ext = ".txt" if kind == "duration" else ".npy"
    return os.path.join(root, _DIRS[kind], stem + ext)


def resolve_artifact(wav_path: str, kind: str) -> Optional[str]:
    """Existing artifact path, accepting the reference's .pt/.npy variants."""
    p = _artifact_path(wav_path, kind)
    if os.path.exists(p):
        return p
    for alt_ext in (".pt", ".npy"):
        alt = os.path.splitext(p)[0] + alt_ext
        if os.path.exists(alt):
            return alt
    return None


def prepare_inputs(
    list_segments: List[tuple],
    hparams: dict,
    feat_extractor_choice: str = "fbank",
) -> Dict[str, Dict[str, str]]:
    """Build/complete the per-utterance feature cache.

    ``list_segments`` rows are (wav_path, speaker, phoneme_string,
    durations_or_boundaries) as parsed from train.txt.
    Returns {"<speaker>_<wav_basename>": {artifact: path}}.
    """
    import jax.numpy as jnp

    sr = hparams["signal"]["sampling_rate"]
    prosody: Dict[str, Dict[str, str]] = {}

    for fid_path, sid, pid, tail in list_segments:
        key = f"{sid}_{os.path.basename(fid_path)}"
        entry = {"wav": fid_path}
        for kind in ARTIFACTS:
            Path(os.path.dirname(_artifact_path(fid_path, kind))).mkdir(
                parents=True, exist_ok=True
            )
            entry[kind] = _artifact_path(fid_path, kind)
        prosody[key] = entry

        # supervised durations come straight from the filelist tail
        tail_vals = [t for t in tail.split(", ") if t]
        n_phones = len(pid.split())
        if len(tail_vals) == n_phones and not os.path.exists(entry["duration"]):
            with open(entry["duration"], "w", encoding="utf8") as f:
                f.write(tail.strip())

        need = [
            k
            for k in ("feat", "pitch", "energy", "alignment")
            if resolve_artifact(fid_path, k) is None
        ]
        if not need:
            for k in ("feat", "pitch", "energy", "alignment", "embedding"):
                found = resolve_artifact(fid_path, k)
                if found:
                    entry[k] = found
            continue

        audio, file_sr = read_wav(fid_path)
        assert file_sr == sr, (
            f"Audio sample rate missmatch: given {file_sr} Hz, expected {sr} Hz"
        )

        mel = np.asarray(log_mel_from_config(jnp.asarray(audio)[None], hparams))[0]
        if "feat" in need:
            np.save(entry["feat"], mel.astype(np.float32))
        if "pitch" in need:
            # "dio" (default) matches the reference's espnet Dio+StoneMask
            # semantics (`tools_for_data.py:134-139`); "nccf" is the faster
            # autocorrelation tracker
            if hparams.get("pitch_extractor", "dio") == "dio":
                f0 = extract_f0_dio(
                    audio, sr, hparams["stft"]["hop_length"],
                    target_len=mel.shape[0],
                )
            else:
                f0 = extract_f0(
                    audio, sr, hparams["stft"]["hop_length"],
                    target_len=mel.shape[0],
                )
            np.save(entry["pitch"], f0)
        if "energy" in need:
            en = np.asarray(frame_energy(jnp.asarray(audio)[None], hparams))[0]
            np.save(entry["energy"], en[: mel.shape[0]].astype(np.float32))
        if "alignment" in need:
            np.save(
                entry["alignment"],
                beta_binomial_prior(n_phones, mel.shape[0]).astype(np.float32),
            )

    return prosody
