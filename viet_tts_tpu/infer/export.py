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
        "kind": "one_stage",
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


def export_two_stage(tts, out_dir: str, batch: int = 1, text_len: int = 64,
                     platforms: Sequence[str] | None = None) -> str:
    """Export a `TwoStageTTS`'s fused acoustic->vocoder graph.

    The artifact fixes the default prosody controls (d/p/e = 1.0) and the
    no-reference-mel path (the zero feats placeholder) — re-export for
    other static control values.
    """
    import jax
    from flax import serialization

    if getattr(tts, "mesh", None) is not None or getattr(
        tts, "_seq_sharding", None
    ) is not None or getattr(tts, "_pp_voc_device", None) is not None:
        raise ValueError(
            "export requires a single-device TwoStageTTS (no data/sequence/"
            "pipeline parallel); re-create the TTS without mesh options"
        )

    n_mels = tts.conf["audio"]["mel"]["channels"]
    import jax.numpy as jnp

    ids = np.zeros((batch, text_len), np.int32)
    lens = np.full((batch,), text_len, np.int32)
    sids = np.zeros((batch,), np.int32)
    aids = np.zeros((batch,), np.int32)
    feats = jnp.zeros((batch, 64, n_mels),
                      jnp.bfloat16 if tts.half else jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax.export.export(tts._synth, **kwargs)(
        tts.acoustic_vars, tts.vocoder_vars, ids, lens, sids, aids, feats
    )

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, WEIGHTS), "wb") as f:
        f.write(serialization.to_bytes(
            {"acoustic": tts.acoustic_vars, "vocoder": tts.vocoder_vars}
        ))
    meta = {
        "kind": "two_stage",
        "model_type": tts.model_type,
        "batch": batch,
        "text_len": text_len,
        "sr": tts.sr,
        "hop": tts.hop,
        "max_mel_frames": tts.max_mel_frames,
        "n_mels": n_mels,
        "platforms": list(exported.platforms),
        "speakers": tts.speakers,
        "accents": tts.accents,
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

    def __call__(self, texts: Sequence[str], speaker: str | int = 0,
                 accent: str | int = 0):
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
        if self.meta.get("kind", "one_stage") == "two_stage":
            aid = self.meta.get("accents", {}).get(
                accent, accent if isinstance(accent, int) else 0)
            aids = np.full((B,), int(aid), np.int32)
            import jax.numpy as jnp

            dt = jnp.bfloat16 if self.meta.get("half") else jnp.float32
            feats = jnp.zeros((B, 64, self.meta["n_mels"]), dt)
            _, mel_lens, wav = self._call(
                self.variables["acoustic"], self.variables["vocoder"],
                ids, lens, sids, aids, feats,
            )
            wav = np.asarray(wav, np.float32)
            mel_lens = np.asarray(mel_lens)
            return [wav[i, : int(mel_lens[i]) * self.hop]
                    for i in range(len(texts))]
        wav, wav_lens = self._call(self.variables, ids, lens, sids)
        wav = np.asarray(wav, np.float32)
        wav_lens = np.asarray(wav_lens)
        return [wav[i, : int(wav_lens[i])] for i in range(len(texts))]


def _main():
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a serving checkpoint as an AOT StableHLO artifact"
    )
    ap.add_argument("--model_type", default="JETS",
                    help="JETS/VITS2/JOINT (one-stage) or "
                         "FASTSPEECH2/ADASPEECH/MATCHA (two-stage)")
    ap.add_argument("-c", "--checkpoint", default=None,
                    help="one-stage checkpoint dir/file")
    ap.add_argument("-a", "--acoustic_checkpoint", default=None)
    ap.add_argument("-v", "--vocoder_checkpoint", default=None)
    ap.add_argument("-o", "--out", required=True, help="artifact directory")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--text_len", type=int, default=64)
    ap.add_argument("--max_mel_frames", type=int, default=1008)
    ap.add_argument("--half", action="store_true")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms, e.g. tpu,cpu")
    args = ap.parse_args()

    platforms = args.platforms.split(",") if args.platforms else None
    two_stage = args.model_type.upper() in (
        "FASTSPEECH2", "ADASPEECH", "MATCHA")
    if two_stage:
        from viet_tts_tpu.infer.api import TwoStageTTS

        tts = TwoStageTTS(
            args.acoustic_checkpoint, args.vocoder_checkpoint,
            model_type=args.model_type,
            max_mel_frames=args.max_mel_frames, half=args.half,
        )
        export_two_stage(tts, args.out, batch=args.batch,
                         text_len=args.text_len, platforms=platforms)
    else:
        from viet_tts_tpu.infer.api import OneStageTTS

        tts = OneStageTTS(
            args.checkpoint, model_type=args.model_type,
            max_mel_frames=args.max_mel_frames, half=args.half,
        )
        export_one_stage(tts, args.out, batch=args.batch,
                         text_len=args.text_len, platforms=platforms)
    print(f"exported {args.model_type} -> {args.out}")


if __name__ == "__main__":
    _main()
