"""FastSpeech2 acoustic model (TPU-native flax implementation).

Capability parity with `models/tts/fastspeech2/model.py` + the
`VarianceAdaptor` of `layers.py:14-257`: transformer or conformer blocks,
supervised or MAS-learned durations (alignment encoder + on-device MAS),
three speaker-conditioning modes (external embedding / CVAE accent+speaker /
id embedding), pitch+energy bucketised embeddings, Gaussian upsampling or
length regulation, optional Postnet.

Differences by design (TPU):
- everything is one jit-able function of static-shape padded batches;
  the training/inference split is the ``train`` flag + which targets exist
- the soft-vs-hard expansion warmup (`layers.py:227-233`) is a `lax.cond`
  on the ``step`` scalar instead of Python control flow
- MAS runs in-graph (`viet_tts_tpu.ops.mas`), never on the host.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from viet_tts_tpu.models.fastspeech2.layers import (
    AccentEncoderNetwork,
    AlignmentEncoder,
    DurationPredictor,
    Postnet,
    VariancePredictor,
)
from viet_tts_tpu.nn.conformer import ConformerDecoder, ConformerEncoder
from viet_tts_tpu.nn.transformer import TransformerDecoder, TransformerEncoder
from viet_tts_tpu.ops import (
    binarize_attention,
    average_by_duration,
    gaussian_upsample,
    length_regulator,
)
from viet_tts_tpu.nn.utils import pad_mask_from_lengths


class VarianceAdaptor(nn.Module):
    """Duration/pitch/energy modelling between encoder and decoder."""

    n_channels: int
    hidden_dim: int
    config: Dict[str, Any]
    stats: Dict[str, Any]

    def setup(self):
        conf = self.config
        vp = conf["variance_predictor"]
        self.learn_alignment = bool(conf["learn_alignment"])
        self.use_gaussian = bool(conf["duration_modelling"]["use_gaussian"])
        self.binarization_start_steps = int(
            conf["duration_modelling"].get("binarization_start_steps", 0)
        )
        if self.learn_alignment:
            self.aligner = AlignmentEncoder(
                n_att_channels=self.n_channels,
                temperature=conf["duration_modelling"]["aligner_temperature"],
            )
        self.duration_predictor = DurationPredictor(
            n_chans=self.n_channels,
            n_layers=vp["dur_predictor_layers"],
            kernel_size=vp["dur_predictor_kernel"],
            dropout=vp["dropout"],
        )
        self.pitch_predictor = VariancePredictor(
            n_chans=vp["filter_size"],
            n_layers=vp["pit_predictor_layers"],
            kernel_size=vp["pit_predictor_kernel"],
            dropout=vp["dropout"],
        )
        self.energy_predictor = VariancePredictor(
            n_chans=vp["filter_size"],
            n_layers=vp["ener_predictor_layers"],
            kernel_size=vp["ener_predictor_kernel"],
            dropout=vp["dropout"],
        )
        ve = conf["variance_embedding"]
        n_bins = ve["n_bins"]
        self.pitch_feature_level = ve["pitch_feature"]
        self.energy_feature_level = ve["energy_feature"]
        self.pitch_embedding = nn.Embed(n_bins, self.hidden_dim)
        self.energy_embedding = nn.Embed(n_bins, self.hidden_dim)

        import numpy as np

        def make_bins(stat, quantization):
            lo, hi = float(stat["min"]), float(stat["max"])
            if quantization == "log":
                return np.exp(np.linspace(np.log(lo), np.log(hi), n_bins - 1))
            return np.linspace(lo, hi, n_bins - 1)

        self.pitch_bins = jnp.asarray(
            make_bins(self.stats["pitch"], ve["pitch_quantization"]), jnp.float32
        )
        self.energy_bins = jnp.asarray(
            make_bins(self.stats["energy"], ve["energy_quantization"]), jnp.float32
        )

    def _embed_variance(self, predictor, embedding, bins, x, target, control, train):
        prediction = predictor(x, train=train)
        value = target if target is not None else prediction * control
        ids = jnp.searchsorted(bins, value, side="left")
        return prediction, embedding(jnp.clip(ids, 0, bins.shape[0]))

    def __call__(
        self,
        x: jnp.ndarray,  # (B, T_text, H) encoder output
        txt_emb: jnp.ndarray,  # (B, T_text, H) raw phoneme embedding
        txt_lens: jnp.ndarray,
        txt_pad_mask: jnp.ndarray,  # True = pad
        spk_emb: Optional[jnp.ndarray] = None,
        mel: Optional[jnp.ndarray] = None,
        mel_lens: Optional[jnp.ndarray] = None,
        mel_pad_mask: Optional[jnp.ndarray] = None,
        pitch_target: Optional[jnp.ndarray] = None,
        energy_target: Optional[jnp.ndarray] = None,
        duration_target: Optional[jnp.ndarray] = None,
        attn_prior: Optional[jnp.ndarray] = None,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        step: Optional[jnp.ndarray] = None,
        max_mel_frames: Optional[int] = None,
        train: bool = False,
    ):
        if spk_emb is not None:
            x = x + spk_emb[:, None, :]

        log_duration_prediction = self.duration_predictor(
            x, txt_pad_mask, train=train
        )

        attn_out = None
        if self.learn_alignment and attn_prior is not None:
            # unsupervised: soft aligner + on-device MAS binarisation
            attn_soft, attn_logprob = self.aligner(
                mel, txt_emb, txt_pad_mask, attn_prior, spk_emb
            )
            attn_hard = binarize_attention(attn_soft, txt_lens, mel_lens)
            attn_hard_dur = attn_hard[:, 0].sum(axis=1)  # (B, T_text)
            attn_out = (attn_soft, attn_hard, attn_hard_dur, attn_logprob)
            duration_rounded = attn_hard_dur
        elif (not self.learn_alignment) and duration_target is not None:
            duration_rounded = duration_target.astype(jnp.float32)
        else:
            # free-running inference
            duration_rounded = jnp.maximum(
                jnp.round(jnp.exp(log_duration_prediction) - 1.0) * d_control,
                0.0,
            )
            duration_rounded = duration_rounded * (~txt_pad_mask)
            mel_lens = jnp.minimum(
                duration_rounded.sum(axis=1), max_mel_frames
            ).astype(jnp.int32)
            mel_pad_mask = pad_mask_from_lengths(mel_lens, max_mel_frames)

        # phoneme-level pitch/energy: both predictors read the SAME x; the
        # embeddings are added only afterwards (`layers.py:215-226`)
        pitch_prediction = energy_prediction = None
        pitch_emb = energy_emb = None
        if self.pitch_feature_level == "phoneme_level":
            if pitch_target is not None:
                pitch_target = average_by_duration(
                    duration_rounded, pitch_target, txt_lens, mel_lens
                )
            pitch_prediction, pitch_emb = self._embed_variance(
                self.pitch_predictor,
                self.pitch_embedding,
                self.pitch_bins,
                x,
                pitch_target,
                p_control,
                train,
            )
        if self.energy_feature_level == "phoneme_level":
            if energy_target is not None:
                energy_target = average_by_duration(
                    duration_rounded, energy_target, txt_lens, mel_lens
                )
            energy_prediction, energy_emb = self._embed_variance(
                self.energy_predictor,
                self.energy_embedding,
                self.energy_bins,
                x,
                energy_target,
                e_control,
                train,
            )
        if pitch_emb is not None:
            x = x + pitch_emb
        if energy_emb is not None:
            x = x + energy_emb

        # expand text-rate states to frame rate
        def hard_expand(x):
            if self.use_gaussian:
                return gaussian_upsample(
                    x,
                    duration_rounded,
                    h_masks=~mel_pad_mask,
                    d_masks=~txt_pad_mask,
                )
            return length_regulator(
                x, duration_rounded.astype(jnp.int32), mel_pad_mask.shape[-1]
            )

        if attn_prior is not None and step is not None:
            soft = jnp.einsum("bmt,bth->bmh", attn_out[0][:, 0], x)
            hard = hard_expand(x)
            x = jnp.where(step < self.binarization_start_steps, soft, hard)
        else:
            x = hard_expand(x)

        # frame-level pitch/energy (same both-read-then-add ordering)
        pitch_emb = energy_emb = None
        if self.pitch_feature_level == "frame_level":
            pitch_prediction, pitch_emb = self._embed_variance(
                self.pitch_predictor,
                self.pitch_embedding,
                self.pitch_bins,
                x,
                pitch_target,
                p_control,
                train,
            )
        if self.energy_feature_level == "frame_level":
            energy_prediction, energy_emb = self._embed_variance(
                self.energy_predictor,
                self.energy_embedding,
                self.energy_bins,
                x,
                energy_target,
                e_control,
                train,
            )
        if pitch_emb is not None:
            x = x + pitch_emb
        if energy_emb is not None:
            x = x + energy_emb

        return (
            x,
            log_duration_prediction,
            pitch_prediction,
            energy_prediction,
            mel_lens,
            mel_pad_mask,
            attn_out,
        ), (duration_rounded, pitch_target, energy_target)


class FastSpeech2(nn.Module):
    """Encoder -> (speaker/CVAE cond) -> VarianceAdaptor -> Decoder -> mel."""

    n_symbols: int
    n_channels: int
    hparams: Dict[str, Any]
    stats: Dict[str, Any]
    n_speakers: int
    n_accents: int = 2

    def setup(self):
        hp = self.hparams
        block = hp["building_block"]["block_type"]
        bconf = hp["building_block"][block]
        common = dict(
            d_model=hp["encoder_hidden"],
            max_seq_len=hp["max_seq_len"],
            # per-block gradient remat: recompute each encoder/decoder block
            # in the backward sweep instead of storing its fp32 activations
            # (the (B, h, T, T) attention tensors dominate train-step HBM
            # traffic — PERF_NOTES.md §2). Inference graphs are unaffected.
            remat=bool(hp.get("remat", False)),
        )
        if block == "transformer":
            self.encoder = TransformerEncoder(
                n_symbols=self.n_symbols,
                n_layers=hp["encoder_layers"],
                num_heads=bconf["encoder_head"],
                d_inner=bconf["conv_filter_size"],
                kernel_sizes=tuple(bconf["conv_kernel_size"]),
                dropout=bconf["encoder_dropout"],
                **common,
            )
            self.decoder = TransformerDecoder(
                n_layers=hp["decoder_layers"],
                num_heads=bconf["decoder_head"],
                d_inner=bconf["conv_filter_size"],
                kernel_sizes=tuple(bconf["conv_kernel_size"]),
                dropout=bconf["decoder_dropout"],
                **common,
            )
        elif block == "conformer":
            conf_args = dict(
                ffn_expansion=bconf["ffn_expansion_factor"],
                conv_expansion=bconf["conv_expansion_factor"],
                kernel_size=bconf["conv_kernel_size"],
                half_step_residual=bconf["half_step_residual"],
                # default False mirrors the reference's mask-dropping
                # nn.Sequential (`blocks/conformer.py`, see nn/conformer.py
                # NOTE); set true in the config for from-scratch training
                # with proper attention key masking
                mask_attn_keys=bool(bconf.get("mask_attn_keys", False)),
                # "shift" (parity default) | "dense" | "flash" — see
                # nn/conformer.py:RelativeMultiHeadAttention. "flash" fuses
                # attention in a Pallas kernel (ops/pallas_attention.py) so
                # the (B, H, T, T) scores never reach HBM.
                attn_implementation=str(
                    hp.get("attn_implementation", "shift")
                ),
            )
            self.encoder = ConformerEncoder(
                n_symbols=self.n_symbols,
                n_layers=hp["encoder_layers"],
                num_heads=bconf["encoder_head"],
                dropout=bconf["encoder_dropout"],
                **conf_args,
                **common,
            )
            self.decoder = ConformerDecoder(
                n_layers=hp["decoder_layers"],
                num_heads=bconf["decoder_head"],
                dropout=bconf["decoder_dropout"],
                **conf_args,
                **common,
            )
        else:
            raise NotImplementedError(f"unknown building block {block!r}")

        self.spk_dims = hp.get("spk_dims", -1)
        self.use_cvae = bool(hp.get("use_cvae", False))
        if self.spk_dims != -1:
            self.speaker_emb = nn.Dense(hp["encoder_hidden"])
        elif self.use_cvae:
            vc = hp["vcae"]
            self.speaker_emb = AccentEncoderNetwork(
                n_speakers=self.n_speakers,
                n_accents=self.n_accents,
                z_dim=hp["encoder_hidden"] // 2,
                conv_layers=vc["conv_layers"],
                conv_chans_list=tuple(vc["conv_chans_list"]),
                conv_kernel_size=vc["conv_kernel_size"],
                conv_stride=vc["conv_stride"],
                gru_layers=vc["gru_layers"],
                gru_units=vc["gru_units"],
            )
        else:
            self.speaker_emb = nn.Embed(self.n_speakers, hp["encoder_hidden"])

        self.variance_adaptor = VarianceAdaptor(
            n_channels=self.n_channels,
            hidden_dim=hp["encoder_hidden"],
            config=hp["variance"],
            stats=self.stats,
        )
        self.feats_linear = nn.Dense(self.n_channels)
        self.use_postnet = bool(hp.get("use_postnet"))
        if self.use_postnet:
            self.postnet = Postnet(
                n_channels=self.n_channels,
                embedding_dim=hp["postnet"]["embedding_dim"],
                conv_layers=hp["postnet"]["conv_layers"],
                kernel_size=hp["postnet"]["kernel_size"],
            )
        self.learn_alignment = bool(hp["variance"]["learn_alignment"])

    def _speaker_vector(self, sids, aids, feats, train):
        accent_probs = None
        if self.use_cvae:
            z_acc, _, z_spk, _, accent_probs = self.speaker_emb(
                feats, aids, sids, train=train
            )
            sid_embs = jnp.concatenate([z_acc, z_spk], axis=1)
        else:
            sid_embs = self.speaker_emb(sids)
        return sid_embs, accent_probs

    def __call__(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        feats: jnp.ndarray,
        feats_lengths: jnp.ndarray,
        duration: jnp.ndarray,  # durations (supervised) or bb prior (MAS)
        pitch: jnp.ndarray,
        energy: jnp.ndarray,
        sids: jnp.ndarray,
        aids: Optional[jnp.ndarray] = None,
        step: jnp.ndarray = 0,
        train: bool = True,
    ):
        """Teacher-forced training forward; returns the reference's 12-tuple
        + (ds, ps, es) (`model.py:105-192`)."""
        T_text, T_mel = text.shape[1], feats.shape[1]
        text_pad = pad_mask_from_lengths(text_lengths, T_text)
        mel_pad = pad_mask_from_lengths(feats_lengths, T_mel)

        hs, text_embs = self.encoder(text, text_pad, train=train)
        sid_embs, accent_probs = self._speaker_vector(sids, aids, feats, train)

        (
            hs,
            log_d_outs,
            p_outs,
            e_outs,
            feats_lengths,
            mel_pad,
            attn_outs,
        ), (ds, ps, es) = self.variance_adaptor(
            x=hs,
            txt_emb=text_embs,
            txt_lens=text_lengths,
            txt_pad_mask=text_pad,
            spk_emb=sid_embs,
            mel=feats,
            mel_lens=feats_lengths,
            mel_pad_mask=mel_pad,
            pitch_target=pitch,
            energy_target=energy,
            duration_target=None if self.learn_alignment else duration,
            attn_prior=duration if self.learn_alignment else None,
            step=step,
            train=train,
        )

        hs, mel_pad = self.decoder(hs, mel_pad, train=train)
        outs = self.feats_linear(hs)
        postnet_outs = self.postnet(outs, train=train) + outs if self.use_postnet else None

        return (
            outs,
            postnet_outs,
            log_d_outs,
            p_outs,
            e_outs,
            text_lengths,
            text_pad,
            feats_lengths,
            mel_pad,
            accent_probs,
            attn_outs,
            sid_embs,
        ), (ds, ps, es)

    def inference(
        self,
        sids: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        max_mel_frames: int,
        feats: Optional[jnp.ndarray] = None,
        aids: Optional[jnp.ndarray] = None,
        spk_embs: Optional[jnp.ndarray] = None,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
    ):
        """Free-running synthesis (`model.py:194-257`).

        ``max_mel_frames`` is the static frame budget (padding bucket);
        returns (mel (B, T_mel, n_mels), mel_lengths, speaker_embedding).
        ``spk_embs`` short-circuits speaker conditioning with a precomputed
        vector (the reference's 2-D ``sids`` case).
        """
        T_text = text.shape[1]
        text_pad = pad_mask_from_lengths(text_lengths, T_text)
        hs, text_embs = self.encoder(text, text_pad, train=False)

        if spk_embs is not None:
            sid_embs = spk_embs
        elif self.use_cvae:
            if feats is None or aids is None:
                raise ValueError("CVAE inference needs reference feats and aids")
            z_acc, _, z_spk, _, _ = self.speaker_emb(feats, aids, sids, train=False)
            sid_embs = jnp.concatenate([z_acc, z_spk], axis=1)
        else:
            sid_embs = self.speaker_emb(sids)

        (hs, _, _, _, mel_lens, mel_pad, _), (d_outs, _, _) = self.variance_adaptor(
            x=hs,
            txt_emb=text_embs,
            txt_lens=text_lengths,
            txt_pad_mask=text_pad,
            spk_emb=sid_embs,
            d_control=d_control,
            p_control=p_control,
            e_control=e_control,
            max_mel_frames=max_mel_frames,
            train=False,
        )

        hs, mel_pad = self.decoder(hs, mel_pad, train=False)
        outs = self.feats_linear(hs)
        if self.use_postnet:
            outs = self.postnet(outs, train=False) + outs
        return outs, mel_lens, sid_embs
