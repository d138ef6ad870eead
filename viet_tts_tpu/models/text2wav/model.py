"""Text2Wav: acoustic model + HiFi-GAN composed into one trainable graph.

Parity with `models/gan_tts/text2wav/model.py`: the acoustic family is
selected by ``version`` (fastspeech2 / adaspeech / matcha); training slices
random segments of the predicted mel (postnet output preferred; Matcha
output denormalised first) and vocodes only the segment; inference chains
``text2mel.inference`` into the vocoder.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from viet_tts_tpu.models.hifigan import HiFiGANGenerator
from viet_tts_tpu.ops import get_random_segments


class Text2Wav(nn.Module):
    n_symbols: int
    n_channels: int
    conf: Dict[str, Any]  # merged config (models/audio sections used)
    stats: Dict[str, Any]
    n_speakers: int
    n_accents: int = 2
    version: str = "fastspeech2"

    def setup(self):
        if self.version == "fastspeech2":
            from viet_tts_tpu.models.fastspeech2 import FastSpeech2 as Acoustic
        elif self.version == "adaspeech":
            from viet_tts_tpu.models.adaspeech import AdaSpeech as Acoustic
        elif self.version == "matcha":
            from viet_tts_tpu.models.matcha import MatchaTTS as Acoustic
        else:
            raise NotImplementedError(f"Not implemented for {self.version} yet")

        self.text2mel = Acoustic(
            n_symbols=self.n_symbols,
            n_channels=self.n_channels,
            hparams=self.conf["models"][self.version],
            stats=self.stats,
            n_speakers=self.n_speakers,
            n_accents=self.n_accents,
        )
        hifi = self.conf["models"]["hifigan"]
        self.mel2wav = HiFiGANGenerator(
            in_channels=self.n_channels,
            channels=hifi.get("upsample_initial_channel", 512),
            global_channels=-1,
            upsample_scales=tuple(hifi.get("upsample_rates", (8, 8, 2, 2))),
            upsample_kernel_sizes=tuple(
                hifi.get("upsample_kernel_sizes", (16, 16, 4, 4))
            ),
            resblock_kernel_sizes=tuple(hifi.get("resblock_kernel_sizes", (3, 7, 11))),
            resblock_dilations=tuple(
                map(tuple, hifi.get("resblock_dilation_sizes", ((1, 3, 5),) * 3))
            ),
            # inference-only MXU-lane packing (`ops/packed_conv.py`); the
            # serving API injects this key, training configs leave it unset
            packed_tail=bool(hifi.get("packed_tail", False)),
        )
        self.segment_size = int(hifi.get("segment_size", 64))
        self.upsample_factor = self.mel2wav.upsample_factor

    def __call__(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        feats: jnp.ndarray,
        feats_lengths: jnp.ndarray,
        duration: Optional[jnp.ndarray] = None,
        pitch: Optional[jnp.ndarray] = None,
        energy: Optional[jnp.ndarray] = None,
        sids: Optional[jnp.ndarray] = None,
        aids: Optional[jnp.ndarray] = None,
        step: jnp.ndarray = 0,
        train: bool = True,
    ) -> Tuple:
        """Returns (outputs, extra_inputs, start_idxs); outputs[0] is the
        vocoded segment waveform (B, S*up, 1), outputs[1] the predicted mel
        segment (B, S, n_mels)."""
        rng = self.make_rng("noise")
        if self.version in ("fastspeech2", "adaspeech"):
            y_pred, y_extra = self.text2mel(
                text=text,
                text_lengths=text_lengths,
                feats=feats,
                feats_lengths=feats_lengths,
                duration=duration,
                pitch=pitch,
                energy=energy,
                sids=sids,
                aids=aids,
                step=step,
                train=train,
            )
            out_feats = y_pred[0] if y_pred[1] is None else y_pred[1]
            segs, start_idxs = get_random_segments(
                jnp.swapaxes(out_feats, 1, 2), feats_lengths, self.segment_size, rng
            )
            out_segments = jnp.swapaxes(segs, 1, 2)
            out_wavs = self.mel2wav(out_segments)
            outputs = (out_wavs, out_segments, None) + tuple(y_pred[2:])
            return outputs, y_extra, start_idxs

        # matcha: vocode denormalised CFM output segments
        preds = self.text2mel(
            text=text,
            text_lengths=text_lengths,
            feats=feats,
            feats_lengths=feats_lengths,
            sids=sids,
            aids=aids,
            duration=duration,
            step=step,
            train=train,
        )
        out_feats = preds[0]
        segs, start_idxs = get_random_segments(
            jnp.swapaxes(out_feats, 1, 2), feats_lengths, self.segment_size, rng
        )
        out_segments = jnp.swapaxes(segs, 1, 2)
        out_wavs = self.mel2wav(self.text2mel.denormalize(out_segments))
        outputs = (out_wavs, out_segments) + tuple(preds[1:])
        return outputs, None, start_idxs

    def inference(
        self,
        sids: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        max_mel_frames: int,
        feats: Optional[jnp.ndarray] = None,
        aids: Optional[jnp.ndarray] = None,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
        seq_sharding=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fused text -> waveform; returns (wav (B, T*up), wav_lengths).
        ``seq_sharding`` time-shards the mel handed to the vocoder
        (sequence-parallel serving, see ``parallel.mesh.seq_sharded``)."""
        mel, mel_lens, _ = self.text2mel.inference(
            sids=sids,
            text=text,
            text_lengths=text_lengths,
            max_mel_frames=max_mel_frames,
            feats=feats,
            aids=aids,
            d_control=d_control,
            p_control=p_control,
            e_control=e_control,
        )
        if seq_sharding is not None:
            import jax

            mel = jax.lax.with_sharding_constraint(mel, seq_sharding)
        wav = self.mel2wav(mel)[..., 0]
        return wav, mel_lens * self.upsample_factor
