"""JETS: jointly trained FastSpeech2 + HiFi-GAN in one graph (flax).

Capability parity with `models/gan_tts/jets/model.py` (espnet-composed):
transformer encoder/decoder with scaled positional encoding, GST style
encoder, speaker-id embedding, learned AlignmentModule + on-device MAS
(`viterbi_decode`) + duration-averaged pitch/energy, continuous-conv
variance embeddings, Gaussian upsampling, random segment slice into the
HiFi-GAN generator. Training returns the reference's 10-tuple; inference is
one fused text->waveform graph with a static frame budget.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from viet_tts_tpu.models.hifigan import HiFiGANGenerator
from viet_tts_tpu.models.jets.layers import (
    AlignmentModule,
    EspnetDurationPredictor,
    EspnetVariancePredictor,
    StyleEncoder,
    VarianceEmbed,
)
from viet_tts_tpu.nn.espnet_transformer import EspnetTransformerEncoder
from viet_tts_tpu.nn.utils import pad_mask_from_lengths
from viet_tts_tpu.ops import (
    average_by_duration,
    gaussian_upsample,
    get_random_segments,
    length_regulator,
    viterbi_decode,
)


class JETS(nn.Module):
    n_symbols: int
    n_channels: int
    hparams: Dict[str, Any]
    n_speakers: int = 1

    def setup(self):
        hp = self.hparams
        adim = hp["adim"]
        self.adim = adim
        self.segment_size = int(hp.get("segment_size", 64))
        self.use_gst = bool(hp.get("use_gst", False))
        self.use_gaussian_upsample = bool(hp.get("use_gaussian_upsample", True))
        self.stop_grad_pitch = bool(hp.get("stop_gradient_from_pitch_predictor", True))
        self.stop_grad_energy = bool(
            hp.get("stop_gradient_from_energy_predictor", False)
        )

        def make_stack(kind, n_symbols):
            is_enc = kind == "enc"
            if hp.get(f"{'encoder' if is_enc else 'decoder'}_type", "transformer") == "conformer":
                from viet_tts_tpu.nn.espnet_conformer import EspnetConformerEncoder

                return EspnetConformerEncoder(
                    d_model=adim,
                    num_heads=hp["aheads"],
                    linear_units=hp["eunits" if is_enc else "dunits"],
                    num_blocks=hp["elayers" if is_enc else "dlayers"],
                    n_symbols=n_symbols,
                    kernel_size=hp.get(
                        f"conformer_{kind}_kernel_size", 7 if is_enc else 31
                    ),
                    dropout=hp.get(f"transformer_{kind}_dropout_rate", 0.2),
                    positional_dropout=hp.get(
                        f"transformer_{kind}_positional_dropout_rate", 0.2
                    ),
                    attn_dropout=hp.get(
                        f"transformer_{kind}_attn_dropout_rate", 0.2
                    ),
                    macaron=hp.get("use_macaron_style_in_conformer", True),
                    ffn_type=hp.get("positionwise_layer_type", "conv1d"),
                    ffn_kernel=hp.get("positionwise_conv_kernel_size", 1),
                    # mirror the reference's rel-pos compatibility fallback
                    # (`jets/model.py:272-293`)
                    legacy=hp.get("conformer_rel_pos_type", "latest") == "legacy",
                    # "shift" (parity default) | "dense" | "flash" — see
                    # nn/espnet_conformer.py:RelPositionMultiHeadedAttention
                    attn_implementation=str(
                        hp.get("attn_implementation", "shift")
                    ),
                    remat=bool(hp.get("remat", False)),
                )
            return EspnetTransformerEncoder(
                d_model=adim,
                num_heads=hp["aheads"],
                linear_units=hp["eunits" if is_enc else "dunits"],
                num_blocks=hp["elayers" if is_enc else "dlayers"],
                n_symbols=n_symbols,
                kernel_size=hp.get("positionwise_conv_kernel_size", 3),
                dropout=hp.get(f"transformer_{kind}_dropout_rate", 0.2),
                positional_dropout=hp.get(
                    f"transformer_{kind}_positional_dropout_rate", 0.2
                ),
                attn_dropout=hp.get(f"transformer_{kind}_attn_dropout_rate", 0.2),
                normalize_before=hp.get(
                    f"{'encoder' if is_enc else 'decoder'}_normalize_before", True
                ),
                use_scaled_pos_enc=hp.get("use_scaled_pos_enc", True),
                attn_implementation=str(
                    hp.get("attn_implementation", "shift")
                ),
                remat=bool(hp.get("remat", False)),
            )

        self.encoder = make_stack("enc", self.n_symbols + 1)
        self.decoder = make_stack("dec", None)

        if self.use_gst:
            self.gst = StyleEncoder(
                gst_tokens=hp.get("gst_tokens", 10),
                gst_token_dim=adim,
                gst_heads=hp.get("gst_heads", 4),
            )
        if self.n_speakers > 1:
            self.sid_emb = nn.Embed(self.n_speakers, adim)

        self.duration_predictor = EspnetDurationPredictor(
            n_layers=hp.get("duration_predictor_layers", 2),
            n_chans=hp.get("duration_predictor_chans", 256),
            kernel_size=hp.get("duration_predictor_kernel_size", 3),
            dropout=hp.get("duration_predictor_dropout_rate", 0.1),
        )
        self.pitch_predictor = EspnetVariancePredictor(
            n_layers=hp.get("pitch_predictor_layers", 5),
            n_chans=hp.get("pitch_predictor_chans", 256),
            kernel_size=hp.get("pitch_predictor_kernel_size", 5),
            dropout=hp.get("pitch_predictor_dropout", 0.5),
        )
        self.pitch_embed = VarianceEmbed(
            adim,
            hp.get("pitch_embed_kernel_size", 1),
            hp.get("pitch_embed_dropout", 0.0),
        )
        self.energy_predictor = EspnetVariancePredictor(
            n_layers=hp.get("energy_predictor_layers", 2),
            n_chans=hp.get("energy_predictor_chans", 256),
            kernel_size=hp.get("energy_predictor_kernel_size", 3),
            dropout=hp.get("energy_predictor_dropout", 0.5),
        )
        self.energy_embed = VarianceEmbed(
            adim,
            hp.get("energy_embed_kernel_size", 1),
            hp.get("energy_embed_dropout", 0.0),
        )

        self.alignment_module = AlignmentModule(adim)

        self.generator = HiFiGANGenerator(
            in_channels=adim,
            out_channels=hp.get("generator_out_channels", 1),
            channels=hp.get("generator_channels", 512),
            global_channels=hp.get("generator_global_channels", -1),
            kernel_size=hp.get("generator_kernel_size", 7),
            upsample_scales=tuple(hp.get("generator_upsample_scales", (8, 8, 2, 2))),
            upsample_kernel_sizes=tuple(
                hp.get("generator_upsample_kernel_sizes", (16, 16, 4, 4))
            ),
            resblock_kernel_sizes=tuple(
                hp.get("generator_resblock_kernel_sizes", (3, 7, 11))
            ),
            resblock_dilations=tuple(
                map(tuple, hp.get("generator_resblock_dilations", ((1, 3, 5),) * 3))
            ),
            use_additional_convs=hp.get("generator_use_additional_convs", True),
            use_weight_norm=hp.get("generator_use_weight_norm", True),
            # inference-only Pallas fused-MRF decode (no VJP — keep off for
            # training; the serving API flips it via hparams)
            fused_mrf=bool(hp.get("fused_mrf", False)),
            # inference-only MXU-lane packing of the small-channel tail
            # stages (`ops/packed_conv.py`)
            packed_tail=bool(hp.get("packed_tail", False)),
        )
        self.upsample_factor = self.generator.upsample_factor

    # ------------------------------------------------------------------
    def _condition(self, hs, feats, sids, train):
        if self.use_gst:
            hs = hs + self.gst(feats, train=train)[:, None]
        if self.n_speakers > 1 and sids is not None:
            hs = hs + self.sid_emb(sids.reshape(-1))[:, None]
        return hs

    def __call__(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        feats: jnp.ndarray,
        feats_lengths: jnp.ndarray,
        pitch: jnp.ndarray,  # (B, T_feats, 1) frame-level
        energy: jnp.ndarray,  # (B, T_feats, 1)
        sids: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Tuple:
        """Training forward -> (wav_segments, bin_loss, log_p_attn,
        start_idxs, d_outs, ds, p_outs, ps, e_outs, es)
        (`jets/model.py:505-645`)."""
        T_text = text.shape[1]
        text_pad = pad_mask_from_lengths(text_lengths, T_text)
        mel_valid = ~pad_mask_from_lengths(feats_lengths, feats.shape[1])

        hs, _ = self.encoder(text, ~text_pad, train=train)
        hs = self._condition(hs, feats, sids, train)

        # alignment: learned scores -> on-device MAS -> durations + averages
        log_p_attn = self.alignment_module(hs, feats, text_pad)
        ds, bin_loss = viterbi_decode(log_p_attn, text_lengths, feats_lengths)
        ps = average_by_duration(
            ds, pitch[..., 0], text_lengths, feats_lengths
        )[..., None]
        es = average_by_duration(
            ds, energy[..., 0], text_lengths, feats_lengths
        )[..., None]

        hs_p = jax.lax.stop_gradient(hs) if self.stop_grad_pitch else hs
        p_outs = self.pitch_predictor(hs_p, text_pad, train=train)
        hs_e = jax.lax.stop_gradient(hs) if self.stop_grad_energy else hs
        e_outs = self.energy_predictor(hs_e, text_pad, train=train)
        d_outs = self.duration_predictor(hs, text_pad, train=train)

        hs = hs + self.pitch_embed(ps, train=train) + self.energy_embed(
            es, train=train
        )

        if self.use_gaussian_upsample:
            hs = gaussian_upsample(hs, ds, h_masks=mel_valid, d_masks=~text_pad)
        else:
            hs = length_regulator(hs, ds.astype(jnp.int32), feats.shape[1])

        zs, _ = self.decoder(hs, mel_valid, train=train)

        rng = self.make_rng("noise")
        z_segments, z_start_idxs = get_random_segments(
            jnp.swapaxes(zs, 1, 2), feats_lengths, self.segment_size, rng
        )
        wav = self.generator(jnp.swapaxes(z_segments, 1, 2))  # (B, S*up, 1)

        return (
            jnp.swapaxes(wav, 1, 2),  # (B, 1, S*up) like the reference
            bin_loss,
            log_p_attn,
            z_start_idxs,
            d_outs,
            ds,
            p_outs,
            ps,
            e_outs,
            es,
        )

    def inference(
        self,
        sids: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        max_mel_frames: int,
        feats: Optional[jnp.ndarray] = None,
        d_control: float = 1.0,
        seq_sharding=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One fused text->waveform graph (`jets/model.py:645-746`).

        Returns (wav (B, max_mel_frames*upsample), wav_lengths).
        GST needs a reference mel; zeros are used when none is given.
        ``seq_sharding`` (a ``NamedSharding`` over (B, T, C), see
        ``parallel.mesh.seq_sharded``) time-shards the vocoder input so
        GSPMD spatially partitions the decode over the mesh.
        """
        zs, mel_lens = self.inference_hidden(
            sids, text, text_lengths, max_mel_frames,
            feats=feats, d_control=d_control,
        )
        if seq_sharding is not None:
            zs = jax.lax.with_sharding_constraint(zs, seq_sharding)
        wav = self.decode_hidden(zs)
        wav_lengths = mel_lens * self.upsample_factor
        return wav, wav_lengths

    def inference_hidden(
        self,
        sids: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        max_mel_frames: int,
        feats: Optional[jnp.ndarray] = None,
        d_control: float = 1.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """`inference` up to the vocoder boundary: (zs (B, T_mel, adim),
        mel_lens). Pairs with `decode_hidden` for chunked streaming decode
        (`infer/streaming.py`) — the HiFiGAN stage is ~82% of the fused
        graph's time, so decoding it per-chunk bounds time-to-first-audio
        by the chunk, not the utterance."""
        T_text = text.shape[1]
        text_pad = pad_mask_from_lengths(text_lengths, T_text)
        hs, _ = self.encoder(text, ~text_pad, train=False)
        if feats is None:
            feats = jnp.zeros((text.shape[0], 64, self.n_channels))
        hs = self._condition(hs, feats, sids, False)

        p_outs = self.pitch_predictor(hs, text_pad, train=False)
        e_outs = self.energy_predictor(hs, text_pad, train=False)
        d_outs = self.duration_predictor(
            hs, text_pad, is_inference=True, train=False
        )
        if d_control != 1.0:
            d_outs = jnp.round(d_outs * d_control)

        hs = hs + self.pitch_embed(p_outs, train=False) + self.energy_embed(
            e_outs, train=False
        )

        mel_lens = jnp.minimum(d_outs.sum(axis=1), max_mel_frames).astype(jnp.int32)
        mel_valid = ~pad_mask_from_lengths(mel_lens, max_mel_frames)
        if self.use_gaussian_upsample:
            hs = gaussian_upsample(hs, d_outs, h_masks=mel_valid, d_masks=~text_pad)
        else:
            hs = length_regulator(hs, d_outs.astype(jnp.int32), max_mel_frames)

        zs, _ = self.decoder(hs, mel_valid, train=False)
        return zs, mel_lens

    def decode_hidden(self, zs: jnp.ndarray) -> jnp.ndarray:
        """Vocoder half of the split inference: zs window -> waveform."""
        return self.generator(zs)[..., 0]
