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
                     platforms: Sequence[str] | None = None,
                     signatures: Sequence[Sequence[int]] | None = None) -> str:
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

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)

    def make_args(B, T):
        ids = np.zeros((B, T), np.int32)
        lens = np.full((B,), T, np.int32)
        sids = np.zeros((B,), np.int32)
        return (tts.variables, ids, lens, sids)

    meta = {
        "kind": "one_stage",
        "model_type": tts.model_type,
        "batch": batch,
        "text_len": text_len,
        "sr": tts.sr,
        "hop": tts.hop,
        "max_mel_frames": tts.max_mel_frames,
        "speakers": tts.speakers,
        "half": bool(getattr(tts, "half", False)),
    }
    return _write_artifacts(tts._synth, make_args, tts.variables, out_dir,
                            batch, text_len, signatures, kwargs, meta)


def _write_artifacts(fn, make_args, weights, out_dir, batch, text_len,
                     signatures, export_kwargs, meta) -> str:
    """Serialize `fn` at one or many (batch, text_len) signatures.

    Single-signature artifacts keep the flat `serving.stablehlo` layout;
    with ``signatures`` each bucket gets `serving_b{B}_t{T}.stablehlo` and
    the loader picks the smallest fitting bucket per request."""
    import jax
    from flax import serialization

    sigs = ([(batch, text_len)] if signatures is None
            else [tuple(map(int, s)) for s in signatures])
    os.makedirs(out_dir, exist_ok=True)
    recorded = []
    for B, T in sigs:
        exported = jax.export.export(fn, **export_kwargs)(*make_args(B, T))
        name = (ARTIFACT if signatures is None
                else f"serving_b{B}_t{T}.stablehlo")
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exported.serialize())
        recorded.append([B, T, name])
        meta["platforms"] = list(exported.platforms)
    with open(os.path.join(out_dir, WEIGHTS), "wb") as f:
        f.write(serialization.to_bytes(weights))
    meta["signatures"] = recorded
    with open(os.path.join(out_dir, META), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def export_two_stage(tts, out_dir: str, batch: int = 1, text_len: int = 64,
                     platforms: Sequence[str] | None = None,
                     signatures: Sequence[Sequence[int]] | None = None) -> str:
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

    def make_args(B, T):
        ids = np.zeros((B, T), np.int32)
        lens = np.full((B,), T, np.int32)
        sids = np.zeros((B,), np.int32)
        aids = np.zeros((B,), np.int32)
        feats = jnp.zeros((B, 64, n_mels),
                          jnp.bfloat16 if tts.half else jnp.float32)
        return (tts.acoustic_vars, tts.vocoder_vars, ids, lens, sids, aids,
                feats)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    meta = {
        "kind": "two_stage",
        "model_type": tts.model_type,
        "batch": batch,
        "text_len": text_len,
        "sr": tts.sr,
        "hop": tts.hop,
        "max_mel_frames": tts.max_mel_frames,
        "n_mels": n_mels,
        "speakers": tts.speakers,
        "accents": tts.accents,
        "half": bool(getattr(tts, "half", False)),
    }
    weights = {"acoustic": tts.acoustic_vars, "vocoder": tts.vocoder_vars}
    return _write_artifacts(tts._synth, make_args, weights, out_dir,
                            batch, text_len, signatures, kwargs, meta)


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
        sigs = self.meta.get("signatures") or [
            [self.meta["batch"], self.meta["text_len"], ARTIFACT]
        ]
        self._calls = {}
        for B, T, name in sigs:
            with open(os.path.join(artifact_dir, name), "rb") as f:
                exported = jax.export.deserialize(bytearray(f.read()))
            self._calls[(int(B), int(T))] = jax.jit(exported.call)
        with open(os.path.join(artifact_dir, WEIGHTS), "rb") as f:
            self.variables = serialization.msgpack_restore(f.read())
        self.sr = self.meta["sr"]
        self.hop = self.meta["hop"]
        self.speakers = self.meta.get("speakers") or {}

    def _pick_signature(self, n_texts: int, seq_len: int):
        """Smallest bucket fitting the request: min batch >= n_texts, then
        min text_len >= seq_len (else the largest text_len, truncating)."""
        fitting = [bt for bt in self._calls if bt[0] >= n_texts]
        if not fitting:
            raise ValueError(
                f"artifact buckets {sorted(self._calls)} cannot serve a "
                f"batch of {n_texts}"
            )
        long_enough = [bt for bt in fitting if bt[1] >= seq_len]
        pool = long_enough or fitting
        return min(pool, key=lambda bt: (bt[0], bt[1] if long_enough
                                         else -bt[1]))

    def __call__(self, texts: Sequence[str], speaker: str | int = 0,
                 accent: str | int = 0):
        from viet_tts_tpu.text import VietnameseG2P, basic_clean, symbols_to_ids

        g2p = getattr(self, "_g2p", None)
        if g2p is None:
            g2p = self._g2p = VietnameseG2P()
        seqs = [
            np.asarray(symbols_to_ids(g2p(basic_clean(t), get_boundary=False)),
                       np.int32)
            for t in texts
        ]
        B, T = self._pick_signature(len(texts), max(len(s) for s in seqs))
        self._call = self._calls[(B, T)]
        ids = np.zeros((B, T), np.int32)
        lens = np.zeros((B,), np.int32)
        for i, seq in enumerate(seqs):
            seq = seq[:T]
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
    ap.add_argument("--signatures", default=None,
                    help='bucket list like "1x32,4x64" (batch x text_len); '
                         "the loader picks the smallest fitting bucket")
    args = ap.parse_args()

    platforms = args.platforms.split(",") if args.platforms else None
    signatures = (
        [tuple(map(int, s.split("x"))) for s in args.signatures.split(",")]
        if args.signatures else None
    )
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
                         text_len=args.text_len, platforms=platforms,
                         signatures=signatures)
    else:
        from viet_tts_tpu.infer.api import OneStageTTS

        tts = OneStageTTS(
            args.checkpoint, model_type=args.model_type,
            max_mel_frames=args.max_mel_frames, half=args.half,
        )
        export_one_stage(tts, args.out, batch=args.batch,
                         text_len=args.text_len, platforms=platforms,
                         signatures=signatures)
    print(f"exported {args.model_type} -> {args.out}")


if __name__ == "__main__":
    _main()
