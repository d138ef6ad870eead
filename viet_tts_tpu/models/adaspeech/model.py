"""AdaSpeech acoustic model (flax).

FS2 variant with Conditional LayerNorm FFT blocks conditioned on the speaker
vector plus AdaSpeech acoustic-condition modelling: a mel UtteranceEncoder
(global), PhonemeLevelEncoder on duration-averaged mels, and a
PhonemeLevelPredictor distilled after ``phoneme_level_encoder_step`` with a
stop-gradient target. Parity: `models/tts/adaspeech/model.py` +
`layers.py:160-305` (the step branch is a traced select).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from viet_tts_tpu.models.adaspeech.layers import (
    CLNTransformerDecoder,
    CLNTransformerEncoder,
    ConditionalLayerNorm,
    PhonemeLevelEncoder,
    PhonemeLevelPredictor,
    UtteranceEncoder,
)
from viet_tts_tpu.models.fastspeech2.layers import (
    AccentEncoderNetwork,
    AlignmentEncoder,
    DurationPredictor,
    Postnet,
    VariancePredictor,
)
from viet_tts_tpu.nn.utils import pad_mask_from_lengths
from viet_tts_tpu.ops import (
    average_by_duration,
    binarize_attention,
    gaussian_upsample,
    length_regulator,
)


class AdaSpeech(nn.Module):
    n_symbols: int
    n_channels: int
    hparams: Dict[str, Any]
    stats: Dict[str, Any]
    n_speakers: int
    n_accents: int = 2

    def setup(self):
        hp = self.hparams
        block = hp["building_block"]["block_type"]
        if block != "transformer":
            raise NotImplementedError("AdaSpeech CLN blocks are transformer-type")
        bconf = hp["building_block"]["transformer"]
        self.encoder = CLNTransformerEncoder(
            n_symbols=self.n_symbols,
            n_layers=hp["encoder_layers"],
            d_model=hp["encoder_hidden"],
            max_seq_len=hp["max_seq_len"],
            num_heads=bconf["encoder_head"],
            d_inner=bconf["conv_filter_size"],
            kernel_sizes=tuple(bconf["conv_kernel_size"]),
            dropout=bconf["encoder_dropout"],
            remat=bool(hp.get("remat", False)),
        )
        self.decoder = CLNTransformerDecoder(
            n_layers=hp["decoder_layers"],
            d_model=hp["decoder_hidden"],
            max_seq_len=hp["max_seq_len"],
            num_heads=bconf["decoder_head"],
            d_inner=bconf["conv_filter_size"],
            kernel_sizes=tuple(bconf["conv_kernel_size"]),
            dropout=bconf["decoder_dropout"],
            remat=bool(hp.get("remat", False)),
        )

        self.use_cvae = bool(hp.get("use_cvae", False))
        if self.use_cvae:
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

        var = hp["variance"]
        vp = var["variance_predictor"]
        self.learn_alignment = bool(var["learn_alignment"])
        self.use_gaussian = bool(var["duration_modelling"]["use_gaussian"])
        self.binarization_start_steps = var["duration_modelling"][
            "binarization_start_steps"
        ]
        if self.learn_alignment:
            self.aligner = AlignmentEncoder(
                n_att_channels=self.n_channels,
                temperature=var["duration_modelling"]["aligner_temperature"],
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
        ve = var["variance_embedding"]
        self.pitch_feature_level = ve["pitch_feature"]
        self.energy_feature_level = ve["energy_feature"]
        n_bins = ve["n_bins"]
        self.pitch_embedding = nn.Embed(n_bins, hp["encoder_hidden"])
        self.energy_embedding = nn.Embed(n_bins, hp["encoder_hidden"])

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

        re = var["reference_encoder"]
        self.phoneme_level_encoder_step = int(re["phoneme_level_encoder_step"])
        phn_dim = int(re["phn_latent_dim"])
        ue = re["utterance_encoder"]
        self.utterance_encoder = UtteranceEncoder(
            n_chans=ue["n_chans"],
            kernel_size=ue["kernel_size"],
            stride=ue["stride"],
            dropout=ue["dropout_rate"],
        )
        pe = re["phoneme_level_encoder"]
        self.phoneme_level_encoder = PhonemeLevelEncoder(
            n_chans=pe["n_chans"],
            kernel_size=pe["kernel_size"],
            dropout=pe["dropout_rate"],
            phn_latent_dim=phn_dim,
        )
        pp = re["phoneme_level_predictor"]
        self.phoneme_level_predictor = PhonemeLevelPredictor(
            n_chans=pp["n_chans"],
            kernel_size=pp["kernel_size"],
            dropout=pp["dropout_rate"],
            phn_latent_dim=phn_dim,
        )
        self.phone_level_embed = nn.Dense(hp["encoder_hidden"])

        self.cln = ConditionalLayerNorm(hp["decoder_hidden"])
        self.feats_linear = nn.Dense(self.n_channels)
        self.use_postnet = bool(hp.get("use_postnet"))
        if self.use_postnet:
            self.postnet = Postnet(
                n_channels=self.n_channels,
                embedding_dim=hp["postnet"]["embedding_dim"],
                conv_layers=hp["postnet"]["conv_layers"],
                kernel_size=hp["postnet"]["kernel_size"],
            )

    @staticmethod
    def _token_avg_mels(duration, feats, text_lengths, feats_lengths):
        """Per-token reference-mel summary fed to the PhonemeLevelEncoder.

        The reference's `frame2phoneme` (`models/tts/fastspeech2/
        function.py:186-197`, called through `get_mel_phoneme_level` in
        `models/tts/adaspeech/function.py:5-19`) takes `np.mean` over the
        2-D (frames, channels) slice — collapsing each token's mel span to
        ONE scalar that the row assignment broadcasts over all 80 channels.
        It also averages IN PLACE: token i overwrites mel ROW i before
        later tokens read their frame spans, so whenever a token's span
        start lags its index (zero-duration tokens earlier in the
        sequence) the mean reads earlier tokens' scalars instead of true
        frames. Both behaviours are mirrored here — trained encoders
        expect them — as a scan whose carry holds per-frame channel means
        (the scalar collapse makes full rows redundant). Token spans that
        overrun the mel (possible with free-running durations) read an
        empty slice: the reference NaNs there; this returns 0.
        """
        B, N = duration.shape
        T = feats.shape[1]
        ds = duration.astype(jnp.int32)
        if text_lengths is not None:
            ds = ds * (jnp.arange(N)[None, :] < text_lengths[:, None])
        cum = jnp.cumsum(ds, axis=-1)
        starts = cum - ds
        t = jnp.arange(T, dtype=jnp.int32)
        frame_valid = (
            (t[None, :] < feats_lengths[:, None]).astype(feats.dtype)
            if feats_lengths is not None
            else jnp.ones((B, T), feats.dtype)
        )

        def step(buf, inputs):
            i, start, d = inputs
            seg = (
                (t[None, :] >= start[:, None]) & (t[None, :] < (start + d)[:, None])
            ).astype(buf.dtype) * frame_valid
            cnt = seg.sum(axis=-1)
            scalar = jnp.where(
                (d > 0) & (cnt > 0),
                (buf * seg).sum(axis=-1) / jnp.maximum(cnt, 1.0),
                0.0,
            )
            buf = jnp.where((t == i)[None, :], scalar[:, None], buf)
            return buf, scalar

        _, scalars = jax.lax.scan(
            step,
            feats.mean(axis=-1),
            (jnp.arange(N, dtype=jnp.int32), starts.T, ds.T),
        )
        scalars = scalars.T  # (B, N)
        return jnp.broadcast_to(
            scalars[..., None], (*scalars.shape, feats.shape[-1])
        )

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

    def _embed_variance(self, predictor, embedding, bins, x, target, control, train):
        prediction = predictor(x, train=train)
        value = target if target is not None else prediction * control
        ids = jnp.searchsorted(bins, value, side="left")
        return prediction, embedding(jnp.clip(ids, 0, bins.shape[0]))

    def __call__(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        feats: jnp.ndarray,
        feats_lengths: jnp.ndarray,
        duration: jnp.ndarray,
        pitch: jnp.ndarray,
        energy: jnp.ndarray,
        sids: jnp.ndarray,
        aids: Optional[jnp.ndarray] = None,
        step: jnp.ndarray = 0,
        train: bool = True,
    ) -> Tuple:
        T_text, T_mel = text.shape[1], feats.shape[1]
        text_pad = pad_mask_from_lengths(text_lengths, T_text)
        mel_pad = pad_mask_from_lengths(feats_lengths, T_mel)

        sid_embs, accent_probs = self._speaker_vector(sids, aids, feats, train)
        hs, text_embs = self.encoder(text, text_pad, sid_embs, train=train)
        x = hs + sid_embs[:, None, :]

        log_d_outs = self.duration_predictor(x, text_pad, train=train)
        attn_outs = None
        if self.learn_alignment:
            attn_soft, attn_logprob = self.aligner(
                feats, text_embs, text_pad, duration, sid_embs
            )
            attn_hard = binarize_attention(attn_soft, text_lengths, feats_lengths)
            attn_hard_dur = attn_hard[:, 0].sum(axis=1)
            attn_outs = (attn_soft, attn_hard, attn_hard_dur, attn_logprob)
            duration_rounded = attn_hard_dur
        else:
            duration_rounded = duration.astype(jnp.float32)

        # AdaSpeech acoustic conditions
        x = x + self.utterance_encoder(feats, train=train)
        avg_mels = self._token_avg_mels(
            duration_rounded, feats, text_lengths, feats_lengths
        )
        phn_encode = self.phoneme_level_encoder(avg_mels, train=train)
        phn_pred = self.phoneme_level_predictor(x, train=train)
        distill = step >= self.phoneme_level_encoder_step
        latent = jnp.where(distill, jax.lax.stop_gradient(phn_encode), phn_encode)
        x = x + self.phone_level_embed(latent)

        # NOTE: unlike FS2's adaptor, the AdaSpeech one predicts pitch AND
        # energy from the same x, adding both embeddings only afterwards
        # (`adaspeech/layers.py:258-269`).
        pitch_target, energy_target = pitch, energy
        if self.pitch_feature_level == "phoneme_level":
            pitch_target = average_by_duration(
                duration_rounded, pitch, text_lengths, feats_lengths
            )
            p_outs, p_emb = self._embed_variance(
                self.pitch_predictor, self.pitch_embedding, self.pitch_bins,
                x, pitch_target, 1.0, train,
            )
        if self.energy_feature_level == "phoneme_level":
            energy_target = average_by_duration(
                duration_rounded, energy, text_lengths, feats_lengths
            )
            e_outs, e_emb = self._embed_variance(
                self.energy_predictor, self.energy_embedding, self.energy_bins,
                x, energy_target, 1.0, train,
            )
        if self.pitch_feature_level == "phoneme_level":
            x = x + p_emb
        if self.energy_feature_level == "phoneme_level":
            x = x + e_emb

        mel_valid = ~mel_pad

        def hard_expand(z):
            if self.use_gaussian:
                return gaussian_upsample(
                    z, duration_rounded, h_masks=mel_valid, d_masks=~text_pad
                )
            return length_regulator(z, duration_rounded.astype(jnp.int32), T_mel)

        if self.learn_alignment:
            soft = jnp.einsum("bmt,bth->bmh", attn_outs[0][:, 0], x)
            x = jnp.where(step < self.binarization_start_steps, soft, hard_expand(x))
        else:
            x = hard_expand(x)

        hs, mel_pad = self.decoder(x, mel_pad, sid_embs, train=train)
        hs = self.cln(hs, sid_embs)
        outs = self.feats_linear(hs)
        postnet_outs = (
            self.postnet(outs, train=train) + outs if self.use_postnet else None
        )

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
            phn_pred,
        ), (duration_rounded, pitch_target, energy_target, phn_encode)

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
        T_text = text.shape[1]
        text_pad = pad_mask_from_lengths(text_lengths, T_text)
        if spk_embs is not None:
            sid_embs = spk_embs
        elif self.use_cvae:
            if feats is None or aids is None:
                raise ValueError("CVAE inference needs reference feats and aids")
            z_acc, _, z_spk, _, _ = self.speaker_emb(feats, aids, sids, train=False)
            sid_embs = jnp.concatenate([z_acc, z_spk], axis=1)
        else:
            sid_embs = self.speaker_emb(sids)

        hs, _ = self.encoder(text, text_pad, sid_embs, train=False)
        x = hs + sid_embs[:, None, :]

        log_d = self.duration_predictor(x, text_pad, train=False)
        duration_rounded = jnp.maximum(
            jnp.round(jnp.exp(log_d) - 1.0) * d_control, 0.0
        ) * (~text_pad)
        mel_lens = jnp.minimum(duration_rounded.sum(axis=1), max_mel_frames).astype(
            jnp.int32
        )
        mel_pad = pad_mask_from_lengths(mel_lens, max_mel_frames)

        # acoustic condition from a reference mel when given. The reference
        # (`adaspeech/layers.py:233-255`, inference => step=0) runs the
        # PhonemeLevelEncoder on the reference mel averaged under PREDICTED
        # durations; the distilled predictor is used only without a mel.
        if feats is not None:
            x = x + self.utterance_encoder(feats, train=False)
            avg_mels = self._token_avg_mels(
                duration_rounded, feats, text_lengths, None
            )
            latent = self.phoneme_level_encoder(avg_mels, train=False)
        else:
            latent = self.phoneme_level_predictor(x, train=False)
        x = x + self.phone_level_embed(latent)

        # both variances predicted from the same x (see __call__ note)
        p_outs, p_emb = self._embed_variance(
            self.pitch_predictor, self.pitch_embedding, self.pitch_bins,
            x, None, p_control, False,
        )
        e_outs, e_emb = self._embed_variance(
            self.energy_predictor, self.energy_embedding, self.energy_bins,
            x, None, e_control, False,
        )
        x = x + p_emb + e_emb

        if self.use_gaussian:
            x = gaussian_upsample(
                x, duration_rounded, h_masks=~mel_pad, d_masks=~text_pad
            )
        else:
            x = length_regulator(
                x, duration_rounded.astype(jnp.int32), max_mel_frames
            )

        hs, mel_pad = self.decoder(x, mel_pad, sid_embs, train=False)
        hs = self.cln(hs, sid_embs)
        outs = self.feats_linear(hs)
        if self.use_postnet:
            outs = self.postnet(outs, train=False) + outs
        return outs, mel_lens, sid_embs
