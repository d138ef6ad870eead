"""AOT serving export: compile-once, deploy-without-model-code artifacts.

`jax.export` serializes the lowered StableHLO of a jitted serving function.
The artifact is device-independent within XLA's compatibility window, so a
deployment host needs only this module (no model classes, no flax graph
construction, no tracing) to load weights + program and serve — the
TPU-native analogue of shipping a TorchScript/ONNX bundle, a layer the
reference does not have (its `test.py` rebuilds the torch model from source
at every load).

Artifact layout (one directory):
    serving.stablehlo   -- serialized jax.export.Exported bytes
    weights.msgpack     -- the serving variables pytree (flax serialization)
    export_meta.json    -- shapes, model type, audio params, platforms

The exported graph keeps the framework's static-shape serving contract: a
fixed (batch, text_len) signature chosen at export time; the loader pads
shorter inputs up to it (the same bucketed-static-shape posture as
training, CLAUDE.md conventions).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

ARTIFACT = "serving.stablehlo"
WEIGHTS = "weights.msgpack"
META = "export_meta.json"


def export_one_stage(tts, out_dir: str, batch: int = 1, text_len: int = 64,
                     platforms: Sequence[str] | None = None) -> str:
    """Export a `OneStageTTS`'s synthesis graph as a serialized artifact.

    ``platforms``: lowering platforms recorded in the artifact (e.g.
    ``("tpu", "cpu")``); defaults to the current backend. Mesh-backed
    serving options (data/sequence parallel) are not exportable — export
    the single-device graph and shard at load time if needed.
    """
    import jax
    from flax import serialization

    if getattr(tts, "mesh", None) is not None or getattr(
        tts, "_seq_sharding", None
    ) is not None:
        raise ValueError(
            "export requires a single-device OneStageTTS (no data_parallel/"
            "sequence_parallel); re-create the TTS without mesh options"
        )

    ids = np.zeros((batch, text_len), np.int32)
    lens = np.full((batch,), text_len, np.int32)
    sids = np.zeros((batch,), np.int32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax.export.export(tts._synth, **kwargs)(
        tts.variables, ids, lens, sids
    )

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, WEIGHTS), "wb") as f:
        f.write(serialization.to_bytes(tts.variables))
    meta = {
        "model_type": tts.model_type,
        "batch": batch,
        "text_len": text_len,
        "sr": tts.sr,
        "hop": tts.hop,
        "max_mel_frames": tts.max_mel_frames,
        "platforms": list(exported.platforms),
        "speakers": tts.speakers,
        "half": bool(getattr(tts, "half", False)),
    }
    with open(os.path.join(out_dir, META), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class ExportedTTS:
    """Serve from an exported artifact: text in, waveforms out.

    Loads the serialized StableHLO + weights; no model classes are
    constructed and nothing is re-traced — `jax.export.deserialize` hands
    XLA the stored program directly (first call per process still pays the
    backend compile, amortized by the persistent compilation cache).
    """

    def __init__(self, artifact_dir: str):
        import jax
        from flax import serialization

        with open(os.path.join(artifact_dir, META)) as f:
            self.meta = json.load(f)
        with open(os.path.join(artifact_dir, ARTIFACT), "rb") as f:
            self._exported = jax.export.deserialize(bytearray(f.read()))
        with open(os.path.join(artifact_dir, WEIGHTS), "rb") as f:
            self.variables = serialization.msgpack_restore(f.read())
        self.sr = self.meta["sr"]
        self.hop = self.meta["hop"]
        self.speakers = self.meta.get("speakers") or {}
        self._call = jax.jit(self._exported.call)

    def __call__(self, texts: Sequence[str], speaker: str | int = 0):
        from viet_tts_tpu.text import VietnameseG2P, basic_clean, symbols_to_ids

        g2p = getattr(self, "_g2p", None)
        if g2p is None:
            g2p = self._g2p = VietnameseG2P()
        B, T = self.meta["batch"], self.meta["text_len"]
        if len(texts) > B:
            raise ValueError(
                f"artifact was exported for batch<={B}, got {len(texts)}"
            )
        ids = np.zeros((B, T), np.int32)
        lens = np.zeros((B,), np.int32)
        for i, t in enumerate(texts):
            phones = g2p(basic_clean(t), get_boundary=False)
            seq = np.asarray(symbols_to_ids(phones), np.int32)[:T]
            ids[i, : len(seq)] = seq
            lens[i] = len(seq)
        lens = np.maximum(lens, 1)
        sid = self.speakers.get(speaker, speaker if isinstance(speaker, int)
                                else 0)
        sids = np.full((B,), int(sid), np.int32)
        wav, wav_lens = self._call(self.variables, ids, lens, sids)
        wav = np.asarray(wav, np.float32)
        wav_lens = np.asarray(wav_lens)
        return [wav[i, : int(wav_lens[i])] for i in range(len(texts))]
