"""Batched inference API: one-stage and two-stage synthesis.

The reference's `test.py:6-7` imports `src.api.modules.tts`
(OneStageTTS/TwoStageTTS) and `modules.upload.api` (save_to_local), which
are missing from its snapshot; this module provides the real thing:
checkpoint + sidecar loading, text -> phoneme ids, bucketed jit-compiled
synthesis, and waveform export.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import yaml

from viet_tts_tpu.data.batching import bucket_for, DEFAULT_TEXT_BUCKETS
from viet_tts_tpu.dsp.audio import write_wav
from viet_tts_tpu.text import NUM_SYMBOLS, VietnameseG2P, basic_clean, symbols_to_ids
from viet_tts_tpu.train.checkpoint import apply_weights, scan_checkpoint


def load_sidecars(ckpt_dir: str) -> Dict:
    out = {}
    cfg = os.path.join(ckpt_dir, "config.yaml")
    if os.path.exists(cfg):
        with open(cfg, "r", encoding="utf8") as f:
            out["conf"] = yaml.safe_load(f)
    for name in ("speakers", "accents", "stats"):
        p = os.path.join(ckpt_dir, f"{name}.json")
        if os.path.exists(p):
            with open(p, "r", encoding="utf8") as f:
                out[name] = json.load(f)
    return out


def load_params(path: str) -> Dict:
    """Raw pytree from a saved checkpoint payload."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def resolve_checkpoint(path: str, prefix: str = "generator") -> str:
    if os.path.isdir(path):
        found = scan_checkpoint(path, prefix)
        if found is None:
            raise FileNotFoundError(f"no {prefix}* checkpoint under {path}")
        return found
    return path


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree (bf16 serving mode: the MXU
    runs bf16 matmuls at 2x the fp32 rate and HBM traffic halves)."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: (
            x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x
        ),
        tree,
    )


DEFAULT_STATS = {
    "pitch": {"min": -3.0, "max": 8.0, "mean": 0.0, "std": 1.0},
    "energy": {"min": -3.0, "max": 8.0, "mean": 0.0, "std": 1.0},
}


def split_sentences(text: str, max_words: int = 40) -> list:
    """Split long-form text into synthesis-sized sentences.

    The reference relied on an external normalizer service returning
    sentence lists (`test.py:56-57`); this is the in-framework equivalent:
    split on sentence punctuation, then fold over-long pieces at commas or
    word boundaries (sequences are capped at 1000 mel frames upstream).
    """
    import re

    pieces = [p.strip() for p in re.split(r"(?<=[.!?;…])\s+", text) if p.strip()]
    out = []
    for p in pieces:
        words = p.split()
        while len(words) > max_words:
            # prefer a comma split inside the window
            cut = max_words
            for i in range(max_words, max_words // 2, -1):
                if words[i - 1].endswith(","):
                    cut = i
                    break
            out.append(" ".join(words[:cut]))
            words = words[cut:]
        if words:
            out.append(" ".join(words))
    return out


class _TTSBase:
    """Shared text front-end + batching."""

    def __init__(self, sr: int = 22050, hop: int = 256):
        self.g2p = VietnameseG2P()
        self.sr = sr
        self.hop = hop

    def synthesize_long(self, text: str, max_words: int = 40, **kwargs):
        """Long-form synthesis: sentence-split, batch, concatenate."""
        chunks = list(self.stream_long(text, max_words=max_words, **kwargs))
        if not chunks:
            return np.zeros(0, np.float32)
        return np.concatenate(chunks)

    def stream_long(self, text: str, max_words: int = 40,
                    batch_sentences: int = 8, **kwargs):
        """Streaming long-form synthesis: yields waveform chunks as each
        sentence batch finishes, so playback can start after the first
        batch instead of after the whole text. Sentences are grouped
        ``batch_sentences`` at a time (one device dispatch per group; the
        text-bucket graphs are shared across groups)."""
        sentences = split_sentences(text, max_words=max_words)
        for i in range(0, len(sentences), max(batch_sentences, 1)):
            group = sentences[i : i + batch_sentences]
            for wav in self(group, **kwargs):
                yield np.asarray(wav)

    def stream_wav_long(self, text: str, max_words: int = 40, **kwargs):
        """Lowest-latency long-form path: sentence-split, then chunked
        vocoder decode within each sentence (`stream_wav`) — first audio
        after ONE vocoder chunk of the first sentence, vs one sentence
        batch for `stream_long`. Backends without a split decode (the
        one-stage Text2Wav composer) raise NotImplementedError; use
        `stream_long` there."""
        for sentence in split_sentences(text, max_words=max_words):
            yield from self.stream_wav(sentence, **kwargs)

    def encode_texts(
        self, texts: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray, int]:
        """texts -> (ids (B, T), lengths (B,), T bucket)."""
        seqs = []
        for t in texts:
            phones = self.g2p(basic_clean(t), get_boundary=False)
            seqs.append(symbols_to_ids(phones))
        max_len = max(len(s) for s in seqs)
        T = bucket_for(max_len, DEFAULT_TEXT_BUCKETS)
        ids = np.zeros((len(seqs), T), np.int32)
        lens = np.zeros(len(seqs), np.int32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s[:T]
            lens[i] = min(len(s), T)
        return ids, lens, T


def _build_acoustic(conf, model_key, stats, n_speakers, n_accents):
    if model_key == "matcha":
        from viet_tts_tpu.models.matcha import MatchaTTS

        return MatchaTTS(
            n_symbols=NUM_SYMBOLS,
            n_channels=conf["audio"]["mel"]["channels"],
            hparams=conf["models"]["matcha"],
            stats=stats,
            n_speakers=n_speakers,
            n_accents=n_accents,
        )
    if model_key == "adaspeech":
        from viet_tts_tpu.models.adaspeech import AdaSpeech

        cls = AdaSpeech
    else:
        from viet_tts_tpu.models.fastspeech2 import FastSpeech2

        cls = FastSpeech2
    return cls(
        n_symbols=NUM_SYMBOLS,
        n_channels=conf["audio"]["mel"]["channels"],
        hparams=conf["models"][model_key],
        stats=stats,
        n_speakers=n_speakers,
        n_accents=n_accents,
    )


def _resolve_packed(packed_vocoder, fused_mel_graph=False):
    """None = auto, decided from A/B measurements (PERF_NOTES.md).

    Lane packing pays on the TPU MXU for the one-stage decoders — JETS
    +18% fp32 / +15% bf16, VITS2 likewise — but it multiplies MACs ~5x,
    so it is a straight loss on CPU, and measured 3x SLOWER inside the
    fused mel->HiFiGAN graphs (two-stage serving / Text2Wav: 0.159 ->
    0.452 s/batch at B=8 on the real chip, bench r3d vs r3e), where XLA
    already keeps the standalone vocoder tail fused. Auto therefore
    enables packing only on TPU and only outside fused mel graphs;
    passing an explicit bool always wins."""
    if packed_vocoder is not None:
        return bool(packed_vocoder)
    if fused_mel_graph:
        return False
    import jax

    return jax.default_backend() == "tpu"


class TwoStageTTS(_TTSBase):
    """Acoustic model -> mel -> HiFi-GAN vocoder.

    model_type in {"FASTSPEECH2", "ADASPEECH", "MATCHA"} selects the
    acoustic family (reconstructed `test.py:36` behaviour).
    """

    def __init__(
        self,
        acoustic_path: str,
        vocoder_path: str,
        model_type: str = "FASTSPEECH2",
        max_mel_frames: int = 1008,
        half: bool = False,
        data_parallel: bool = False,
        sequence_parallel: bool = False,
        pipeline_parallel: bool = False,
        fused_vocoder: bool = False,
        packed_vocoder: bool | None = None,
    ):
        import jax

        self.model_type = model_type.lower()
        acoustic_ckpt = resolve_checkpoint(acoustic_path)
        vocoder_ckpt = resolve_checkpoint(vocoder_path)
        side = load_sidecars(os.path.dirname(acoustic_ckpt))
        conf = side.get("conf")
        if conf is None:
            from viet_tts_tpu.config import build_config

            conf = build_config("config/")
        self.conf = conf
        self.stats = side.get("stats") or DEFAULT_STATS
        self.speakers = side.get("speakers") or {}
        self.accents = side.get("accents") or {}
        super().__init__(
            sr=conf["audio"]["signal"]["sampling_rate"],
            hop=conf["audio"]["stft"]["hop_length"],
        )
        self.max_mel_frames = max_mel_frames

        n_spk = max(len(self.speakers), 1)
        n_acc = max(len(self.accents), 2)
        self.acoustic = _build_acoustic(
            conf, self.model_type, self.stats, n_spk, n_acc
        )
        from viet_tts_tpu.models.hifigan import HiFiGANGenerator

        hifi = conf["models"].get("hifigan", {})
        self.vocoder = HiFiGANGenerator(
            in_channels=conf["audio"]["mel"]["channels"],
            channels=hifi.get("upsample_initial_channel", 512),
            upsample_scales=tuple(hifi.get("upsample_rates", (8, 8, 2, 2))),
            upsample_kernel_sizes=tuple(
                hifi.get("upsample_kernel_sizes", (16, 16, 4, 4))
            ),
            resblock_kernel_sizes=tuple(
                hifi.get("resblock_kernel_sizes", (3, 7, 11))
            ),
            resblock_dilations=tuple(
                map(tuple, hifi.get("resblock_dilation_sizes", ((1, 3, 5),) * 3))
            ),
            fused_mrf=fused_vocoder,
            packed_tail=_resolve_packed(packed_vocoder, fused_mel_graph=True),
        )

        self._load_weights(acoustic_ckpt, vocoder_ckpt)
        self.half = half
        if half:
            import jax.numpy as jnp

            self.acoustic_vars = cast_floating(self.acoustic_vars, jnp.bfloat16)
            self.vocoder_vars = cast_floating(self.vocoder_vars, jnp.bfloat16)
        # data-parallel serving: replicate weights, shard the batch axis;
        # XLA runs the same jitted graph SPMD over the mesh (no code change
        # in the model -- sharding is operand placement only)
        self.mesh = None
        self._seq_sharding = None
        if data_parallel and len(jax.devices()) > 1:
            from viet_tts_tpu.parallel import make_mesh, replicated

            self.mesh = make_mesh()
            rep = replicated(self.mesh)
            self.acoustic_vars = jax.device_put(self.acoustic_vars, rep)
            self.vocoder_vars = jax.device_put(self.vocoder_vars, rep)
        elif sequence_parallel and len(jax.devices()) > 1:
            # time-shard the mel handed to the vocoder (see OneStageTTS)
            from viet_tts_tpu.parallel import make_mesh, replicated, seq_sharded

            smesh = make_mesh()
            rep = replicated(smesh)
            self.acoustic_vars = jax.device_put(self.acoustic_vars, rep)
            self.vocoder_vars = jax.device_put(self.vocoder_vars, rep)
            self._seq_sharding = seq_sharded(smesh)
        # pipeline-parallel serving: the acoustic stage committed to one
        # device, the vocoder to another; dispatch is async, so successive
        # batches (synthesize_long / stream_long sentence batches) overlap —
        # stage 1 of batch i+1 runs while stage 2 of batch i decodes
        self._pp_voc_device = None
        if pipeline_parallel and len(jax.devices()) > 1:
            assert not (data_parallel or sequence_parallel), (
                "pipeline_parallel splits stages across devices; combine "
                "with data_parallel/sequence_parallel is not supported"
            )
            d0, d1 = jax.devices()[0], jax.devices()[1]
            self.acoustic_vars = jax.device_put(self.acoustic_vars, d0)
            self.vocoder_vars = jax.device_put(self.vocoder_vars, d1)
            self._pp_voc_device = d1
        # variables passed as jit args (NOT closure constants — closing over
        # the parameter pytree would bake it into the HLO as literals)
        self._synth = jax.jit(
            self._synth_impl,
            static_argnames=("d_control", "p_control", "e_control"),
        )
        self._synth_ac = jax.jit(
            self._acoustic_impl,
            static_argnames=("d_control", "p_control", "e_control"),
        )
        self._synth_voc = jax.jit(self._vocoder_impl)

    # -- weights --------------------------------------------------------
    def _load_weights(self, acoustic_ckpt: str, vocoder_ckpt: str):
        import jax
        import jax.numpy as jnp

        from viet_tts_tpu.train.state import init_on_cpu

        key = jax.random.PRNGKey(0)
        ids = jnp.zeros((1, 32), jnp.int32)
        lens = jnp.ones(1, jnp.int32) * 32
        feats = jnp.zeros((1, 64, self.conf["audio"]["mel"]["channels"]))
        sids = jnp.zeros(1, jnp.int32)
        aids = jnp.zeros(1, jnp.int32)
        ac_vars = init_on_cpu(
            self.acoustic.init,
            {"params": key, "dropout": key, "reparam": key},
            sids,
            ids,
            lens,
            64,
            feats=feats,
            aids=aids,
            method=self.acoustic.inference,
        )
        voc_vars = init_on_cpu(self.vocoder.init, key, feats)

        ac_payload = load_params(acoustic_ckpt)
        voc_payload = load_params(vocoder_ckpt)
        ac_params, skipped_a = apply_weights(
            jax.device_get(ac_vars["params"]), ac_payload.get("params", {})
        )
        voc_params, skipped_v = apply_weights(
            jax.device_get(voc_vars["params"]), voc_payload.get("params", {})
        )
        self.acoustic_vars = {
            "params": ac_params,
            "batch_stats": ac_payload.get(
                "batch_stats", jax.device_get(ac_vars.get("batch_stats", {}))
            ),
        }
        self.vocoder_vars = {"params": voc_params}
        self.skipped = {"acoustic": skipped_a, "vocoder": skipped_v}

    # -- synthesis ------------------------------------------------------
    def _acoustic_impl(
        self, acoustic_vars, ids, lens, sids, aids, feats,
        d_control=1.0, p_control=1.0, e_control=1.0,
    ):
        import jax

        mel, mel_lens, _ = self.acoustic.apply(
            acoustic_vars,
            sids,
            ids,
            lens,
            self.max_mel_frames,
            feats=feats,
            aids=aids,
            d_control=d_control,
            p_control=p_control,
            e_control=e_control,
            method=self.acoustic.inference,
            rngs={"noise": jax.random.PRNGKey(0)},  # Matcha ODE start noise
        )
        return mel, mel_lens

    def _vocoder_impl(self, vocoder_vars, mel):
        return self.vocoder.apply(vocoder_vars, mel)[..., 0]

    def _synth_impl(
        self, acoustic_vars, vocoder_vars, ids, lens, sids, aids, feats,
        d_control=1.0, p_control=1.0, e_control=1.0,
    ):
        import jax

        mel, mel_lens = self._acoustic_impl(
            acoustic_vars, ids, lens, sids, aids, feats,
            d_control=d_control, p_control=p_control, e_control=e_control,
        )
        if self._seq_sharding is not None:
            mel = jax.lax.with_sharding_constraint(mel, self._seq_sharding)
        wav = self._vocoder_impl(vocoder_vars, mel)
        return mel, mel_lens, wav

    def stream_wav(
        self,
        text: str,
        speaker: str | int = 0,
        accent: str | int = 0,
        chunk_frames: int = 64,
        context_frames: int = 32,
    ):
        """Yield waveform chunks for ONE utterance as the vocoder decodes.

        The acoustic stage runs once (cheap: ~7% of the graph); the
        HiFi-GAN decode — the serving bottleneck — is then streamed in
        ``chunk_frames``-sized mel windows with receptive-field context, so
        the first audio arrives after one chunk instead of the full
        utterance (`infer/streaming.py`). Concatenated chunks match the
        non-streamed decode to float tolerance.
        """
        import jax.numpy as jnp

        from viet_tts_tpu.infer.streaming import stream_vocoder

        ids, lens, _ = self.encode_texts([text])
        sid = self.speakers.get(speaker, speaker if isinstance(speaker, int)
                                else 0)
        aid = self.accents.get(accent, accent if isinstance(accent, int)
                               else 0)
        dt = jnp.bfloat16 if self.half else jnp.float32
        feats = jnp.zeros((1, 64, self.conf["audio"]["mel"]["channels"]), dt)
        mel, mel_lens = self._synth_ac(
            self.acoustic_vars, jnp.asarray(ids), jnp.asarray(lens),
            jnp.full((1,), int(sid), jnp.int32),
            jnp.full((1,), int(aid), jnp.int32), feats,
        )
        n_frames = int(np.asarray(mel_lens)[0])
        emitted = 0
        for chunk in stream_vocoder(
            self._synth_voc, self.vocoder_vars, mel,
            self.hop, chunk_frames=chunk_frames,
            context_frames=context_frames,
        ):
            want = n_frames * self.hop - emitted
            if want <= 0:
                break
            out = chunk[0, : min(chunk.shape[1], want)]
            emitted += out.shape[0]
            yield out

    def __call__(
        self,
        texts: Sequence[str],
        speaker: str | int = 0,
        accent: str | int = 0,
        reference_mel: Optional[np.ndarray] = None,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
    ) -> List[np.ndarray]:
        """Synthesize a batch of sentences -> list of float32 waveforms."""
        import jax.numpy as jnp

        ids, lens, _ = self.encode_texts(texts)
        B = len(texts)
        sid = self.speakers.get(speaker, speaker if isinstance(speaker, int) else 0)
        aid = self.accents.get(accent, accent if isinstance(accent, int) else 0)
        sids = jnp.full((B,), int(sid), jnp.int32)
        aids = jnp.full((B,), int(aid), jnp.int32)
        dt = jnp.bfloat16 if self.half else jnp.float32
        if reference_mel is None:
            feats = jnp.zeros((B, 64, self.conf["audio"]["mel"]["channels"]), dt)
        else:
            feats = jnp.asarray(
                np.broadcast_to(
                    reference_mel[None], (B, *reference_mel.shape)
                ).copy(),
                dt,
            )
        inputs = (jnp.asarray(ids), jnp.asarray(lens), sids, aids, feats)
        if self.mesh is not None:
            from viet_tts_tpu.parallel import pad_batch_to_devices, shard_batch

            inputs = shard_batch(
                self.mesh, pad_batch_to_devices(inputs, self.mesh.devices.size)
            )
        if self._pp_voc_device is not None:
            import jax

            mel, mel_lens = self._synth_ac(
                self.acoustic_vars, *inputs,
                d_control=d_control, p_control=p_control, e_control=e_control,
            )
            # async device-to-device hop: the next batch's acoustic stage
            # dispatches on device 0 while this one decodes on device 1
            mel = jax.device_put(mel, self._pp_voc_device)
            wav = self._synth_voc(self.vocoder_vars, mel)
        else:
            _, mel_lens, wav = self._synth(
                self.acoustic_vars, self.vocoder_vars, *inputs,
                d_control=d_control, p_control=p_control, e_control=e_control,
            )
        wav = np.asarray(wav, np.float32)
        mel_lens = np.asarray(mel_lens)
        return [wav[i, : int(mel_lens[i]) * self.hop] for i in range(B)]


class OneStageTTS(_TTSBase):
    """Fused text->waveform models (JETS / VITS2 / Text2Wav)."""

    def __init__(self, checkpoint_path: str, model_type: str = "JETS",
                 max_mel_frames: int = 1008, half: bool = False,
                 data_parallel: bool = False, sequence_parallel: bool = False,
                 fused_vocoder: bool = False,
                 packed_vocoder: bool | None = None):
        import jax

        self.model_type = model_type.lower()
        ckpt_path = resolve_checkpoint(checkpoint_path)
        side = load_sidecars(os.path.dirname(ckpt_path))
        conf = side.get("conf")
        if conf is None:
            from viet_tts_tpu.config import build_config

            conf = build_config("config/")
        self.conf = conf
        self.stats = side.get("stats") or DEFAULT_STATS
        self.speakers = side.get("speakers") or {}
        self.accents = side.get("accents") or {}
        super().__init__(
            sr=conf["audio"]["signal"]["sampling_rate"],
            hop=conf["audio"]["stft"]["hop_length"],
        )
        self.max_mel_frames = max_mel_frames
        n_spk = max(len(self.speakers), 1)

        if self.model_type == "jets":
            from viet_tts_tpu.models.jets import JETS

            jets_hp = dict(conf["models"]["jets"]["generator_params"])
            if fused_vocoder:
                jets_hp["fused_mrf"] = True
            jets_hp["packed_tail"] = _resolve_packed(packed_vocoder)
            self.model = JETS(
                n_symbols=NUM_SYMBOLS,
                n_channels=conf["audio"]["mel"]["channels"],
                hparams=jets_hp,
                n_speakers=n_spk,
            )
            self._upsample = int(np.prod(
                jets_hp.get("generator_upsample_scales", (8, 8, 2, 2))
            ))
        elif self.model_type == "vits2":
            if fused_vocoder:
                raise ValueError(
                    "fused_vocoder is only wired into the HiFiGAN-family "
                    "decoders (jets / two-stage); the VITS2 generator has "
                    "its own decode stack"
                )
            from viet_tts_tpu.models.vits2 import VITS2

            vits_hp = dict(conf["models"]["vits2"])
            vits_hp["packed_tail"] = _resolve_packed(packed_vocoder)
            self.model = VITS2(
                n_symbols=NUM_SYMBOLS,
                hparams=vits_hp,
                n_speakers=n_spk,
            )
            self._upsample = int(np.prod(
                vits_hp.get("upsample_rates", (8, 8, 2, 2))
            ))
        else:  # joint text2wav
            from viet_tts_tpu.models.text2wav import Text2Wav

            if _resolve_packed(packed_vocoder, fused_mel_graph=True):
                conf = dict(conf)
                conf["models"] = dict(conf["models"])
                conf["models"]["hifigan"] = dict(
                    conf["models"].get("hifigan", {}), packed_tail=True
                )
            self.model = Text2Wav(
                n_symbols=NUM_SYMBOLS,
                n_channels=conf["audio"]["mel"]["channels"],
                conf=conf,
                stats=self.stats,
                n_speakers=n_spk,
                n_accents=max(len(self.accents), 2),
                version=conf.get("version") or "fastspeech2",
            )

        import jax.numpy as jnp

        from viet_tts_tpu.train.state import init_on_cpu

        key = jax.random.PRNGKey(0)
        ids = jnp.zeros((1, 32), jnp.int32)
        lens = jnp.ones(1, jnp.int32) * 32
        model_vars = init_on_cpu(
            self.model.init,
            {"params": key, "dropout": key, "noise": key, "reparam": key},
            jnp.zeros(1, jnp.int32),
            ids,
            lens,
            self.max_mel_frames,
            method=self.model.inference,
        )
        payload = load_params(ckpt_path)
        params, self.skipped = apply_weights(
            jax.device_get(model_vars["params"]), payload.get("params", {})
        )
        self.variables = {"params": params}
        if "batch_stats" in model_vars:
            self.variables["batch_stats"] = payload.get(
                "batch_stats", jax.device_get(model_vars["batch_stats"])
            )
        self.half = half
        if half:
            self.variables = cast_floating(self.variables, jnp.bfloat16)
        self.mesh = None
        self._seq_sharding = None
        if data_parallel and len(jax.devices()) > 1:
            from viet_tts_tpu.parallel import make_mesh, replicated

            self.mesh = make_mesh()
            self.variables = jax.device_put(self.variables, replicated(self.mesh))
        elif sequence_parallel and len(jax.devices()) > 1:
            # sequence-parallel serving: weights replicated, the vocoder's
            # time axis spatially partitioned over the mesh (the latency
            # lever when one long utterance can't fill the batch axis);
            # self.mesh stays None so __call__ doesn't shard the batch
            from viet_tts_tpu.parallel import make_mesh, replicated, seq_sharded

            smesh = make_mesh()
            self.variables = jax.device_put(self.variables, replicated(smesh))
            self._seq_sharding = seq_sharded(smesh)

        def _synth(variables, ids, lens, sids):
            return self.model.apply(
                variables,
                sids,
                ids,
                lens,
                self.max_mel_frames,
                seq_sharding=self._seq_sharding,
                method=self.model.inference,
                rngs={"noise": jax.random.PRNGKey(0)},
            )

        self._synth = jax.jit(_synth)

    def stream_wav(
        self,
        text: str,
        speaker: str | int = 0,
        chunk_frames: int = 64,
        context_frames: int = 32,
    ):
        """Yield waveform chunks for ONE utterance (JETS / VITS2).

        Splits the fused graph at the vocoder boundary
        (`inference_hidden`/`decode_hidden` on the model): the acoustic
        half runs once, the conv decoder — the serving bottleneck —
        streams in fixed-shape windows with receptive-field context
        (`infer/streaming.py`), so first audio arrives after one chunk.
        """
        import jax
        import jax.numpy as jnp

        from viet_tts_tpu.infer.streaming import stream_vocoder

        if self.model_type not in ("jets", "vits2"):
            raise NotImplementedError(
                "chunked streaming decode is wired for JETS/VITS2; the "
                "Text2Wav composer decode remains monolithic (use "
                "stream_long for sentence-level streaming)"
            )
        if getattr(self, "_stream_fns", None) is None:
            hidden = jax.jit(lambda v, ids, lens, sids: self.model.apply(
                v, sids, ids, lens, self.max_mel_frames,
                method=self.model.inference_hidden,
                rngs={"noise": jax.random.PRNGKey(0)},
            ))
            if self.model_type == "vits2":
                voc3 = jax.jit(lambda v, zs, sids: self.model.apply(
                    v, zs, sids, method=self.model.decode_hidden,
                ))
                voc = lambda sids: (  # noqa: E731
                    lambda v, zs: voc3(v, zs, sids))
            else:
                voc2 = jax.jit(lambda v, zs: self.model.apply(
                    v, zs, method=self.model.decode_hidden,
                ))
                voc = lambda sids: voc2  # noqa: E731
            self._stream_fns = (hidden, voc)
        hidden, voc = self._stream_fns

        ids, lens, _ = self.encode_texts([text])
        sid = self.speakers.get(speaker, speaker if isinstance(speaker, int)
                                else 0)
        sids_arr = jnp.full((1,), int(sid), jnp.int32)
        zs, mel_lens = hidden(
            self.variables, jnp.asarray(ids), jnp.asarray(lens), sids_arr,
        )
        up = self._upsample
        n_samples = int(np.asarray(mel_lens)[0]) * up
        emitted = 0
        for chunk in stream_vocoder(
            voc(sids_arr), self.variables, zs, up,
            chunk_frames=chunk_frames, context_frames=context_frames,
        ):
            want = n_samples - emitted
            if want <= 0:
                break
            out = chunk[0, : min(chunk.shape[1], want)]
            emitted += out.shape[0]
            yield out

    def __call__(self, texts: Sequence[str], speaker: str | int = 0) -> List[np.ndarray]:
        import jax.numpy as jnp

        ids, lens, _ = self.encode_texts(texts)
        sid = self.speakers.get(speaker, speaker if isinstance(speaker, int) else 0)
        sids = jnp.full((len(texts),), int(sid), jnp.int32)
        inputs = (jnp.asarray(ids), jnp.asarray(lens), sids)
        if self.mesh is not None:
            from viet_tts_tpu.parallel import pad_batch_to_devices, shard_batch

            inputs = shard_batch(
                self.mesh, pad_batch_to_devices(inputs, self.mesh.devices.size)
            )
        wav, wav_lens = self._synth(self.variables, *inputs)
        wav, wav_lens = np.asarray(wav, np.float32), np.asarray(wav_lens)
        return [wav[i, : int(wav_lens[i])] for i in range(len(texts))]


def save_to_local(
    audio: np.ndarray, path: str, sr: int = 22050
) -> str:
    """Persist synthesized audio (role of the missing `modules.upload.api`).

    Writes 16-bit PCM WAV (the reference saved m4a via external tooling;
    this environment has no ffmpeg, so WAV is the export format).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_wav(path, audio, sr)
    return path
