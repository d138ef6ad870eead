"""Matcha-TTS: conditional flow matching acoustic model (flax).

Parity with `models/tts/matcha/model.py` + `layers.py:95-251`: RoPE text
encoder produces the prior mu_x; the FS2 AlignmentEncoder + on-device MAS
learn durations; OT-CFM training (y=(1-(1-sigma)t)z + t*x1, u=x1-(1-sigma)z,
sigma_min=1e-4); inference is a fixed-step Euler ODE as `lax.scan` followed
by dataset-stats denormalisation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from viet_tts_tpu.models.fastspeech2.layers import (
    AccentEncoderNetwork,
    AlignmentEncoder,
    DurationPredictor,
)
from viet_tts_tpu.models.matcha.decoder import UNetDecoder
from viet_tts_tpu.models.matcha.layers import TextEncoder
from viet_tts_tpu.nn.utils import pad_mask_from_lengths
from viet_tts_tpu.ops import binarize_attention, gaussian_upsample, length_regulator


def fix_len_compatibility(length: int, num_downsamplings: int = 2) -> int:
    """Round up to a multiple of 2^num_downsamplings (UNet constraint)."""
    f = 2**num_downsamplings
    return ((length + f - 1) // f) * f


class CFM(nn.Module):
    """Optimal-transport conditional flow matching wrapper."""

    out_channels: int
    decoder_params: Dict[str, Any]
    sigma_min: float = 1e-4

    def setup(self):
        p = self.decoder_params
        self.estimator = UNetDecoder(
            out_channels=self.out_channels,
            channels=tuple(p.get("channels", (256, 256))),
            dropout=p.get("dropout", 0.05),
            attention_head_dim=p.get("attention_head_dim", 64),
            n_blocks=p.get("n_blocks", 1),
            num_mid_blocks=p.get("num_mid_blocks", 2),
            num_heads=p.get("num_heads", 2),
            down_block_type=p.get("down_block_type", "transformer"),
            mid_block_type=p.get("mid_block_type", "transformer"),
            up_block_type=p.get("up_block_type", "transformer"),
            remat=bool(p.get("remat", False)),
        )

    def __call__(
        self,
        x1: jnp.ndarray,  # (B, T, n_feats) target mel
        mask: jnp.ndarray,  # (B, T, 1)
        mu: jnp.ndarray,  # (B, T, n_feats)
        spks: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Training: returns (y_pred, u) for the CFM MSE."""
        rng = self.make_rng("noise")
        r_t, r_z = jax.random.split(rng)
        B = x1.shape[0]
        t = jax.random.uniform(r_t, (B, 1, 1), dtype=x1.dtype)
        z = jax.random.normal(r_z, x1.shape, dtype=x1.dtype)
        y = (1.0 - (1.0 - self.sigma_min) * t) * z + t * x1
        u = x1 - (1.0 - self.sigma_min) * z
        y_pred = self.estimator(y, mask, mu, t[:, 0, 0], spks, train=train)
        return y_pred, u

    def solve(
        self,
        mu: jnp.ndarray,
        mask: jnp.ndarray,
        n_timesteps: int,
        temperature: float = 0.0,
        spks: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Fixed-Euler ODE from noise to mel.

        The loop is unrolled in Python: `n_timesteps` is static and small
        (10 at serving), and a bound flax submodule called inside a raw
        `lax.scan` body leaks tracers on re-trace (flax caches call
        intermediates outside the scan scope)."""
        rng = self.make_rng("noise")
        z = jax.random.normal(rng, mu.shape, dtype=mu.dtype) * temperature
        dt = 1.0 / n_timesteps
        x = z
        for i in range(n_timesteps):
            t = jnp.full((mu.shape[0],), i * dt, mu.dtype)
            x = x + dt * self.estimator(x, mask, mu, t, spks, train=False)
        return x


class MatchaTTS(nn.Module):
    n_symbols: int
    n_channels: int
    hparams: Dict[str, Any]
    stats: Dict[str, Any]
    n_speakers: int
    n_accents: int = 2

    def setup(self):
        hp = self.hparams
        self.spk_emb_dim = hp["spk_emb_dim"]
        self.encoder = TextEncoder(
            n_vocab=self.n_symbols,
            n_feats=self.n_channels,
            n_spks=self.n_speakers,
            spk_emb_dim=self.spk_emb_dim,
            encoder_params=hp["text_encoder"],
        )
        self.spk_dims = hp.get("spk_dims", -1)
        self.use_cvae = bool(hp.get("use_cvae", False))
        if self.spk_dims != -1 and self.spk_dims is not None and self.spk_dims > 0:
            self.speaker_emb = nn.Dense(self.spk_emb_dim)
        elif self.use_cvae:
            vc = hp["vcae"]
            self.speaker_emb = AccentEncoderNetwork(
                n_speakers=self.n_speakers,
                n_accents=self.n_accents,
                z_dim=self.spk_emb_dim // 2,
                conv_layers=vc["conv_layers"],
                conv_chans_list=tuple(vc["conv_chans_list"]),
                conv_kernel_size=vc["conv_kernel_size"],
                conv_stride=vc["conv_stride"],
                gru_layers=vc["gru_layers"],
                gru_units=vc["gru_units"],
            )
        else:
            self.speaker_emb = nn.Embed(self.n_speakers, self.spk_emb_dim)

        self.aligner = AlignmentEncoder(
            n_att_channels=self.n_channels,
            temperature=hp["duration_modelling"]["aligner_temperature"],
        )
        self.binarization_start_steps = hp["duration_modelling"][
            "binarization_start_steps"
        ]
        vp = hp["variance_predictor"]
        self.duration_predictor = DurationPredictor(
            n_chans=self.n_channels,
            n_layers=vp["dur_predictor_layers"],
            kernel_size=vp["dur_predictor_kernel"],
            dropout=vp["dropout"],
        )
        self.use_gaussian = bool(hp["duration_modelling"]["use_gaussian"])
        self.decoder = CFM(
            out_channels=self.n_channels,
            decoder_params=hp["decoder"],
            sigma_min=float(hp["flow_matching"].get("sigma_min", 1e-4)),
        )

    def denormalize(self, mel: jnp.ndarray) -> jnp.ndarray:
        mu = jnp.asarray(self.stats["mel_mean"])
        std = jnp.asarray(self.stats["mel_std"])
        return mel * std + mu

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
        feats: jnp.ndarray,  # (B, T_mel, n_mels) NORMALISED mels
        feats_lengths: jnp.ndarray,
        sids: Optional[jnp.ndarray] = None,
        aids: Optional[jnp.ndarray] = None,
        duration: Optional[jnp.ndarray] = None,  # bb prior (B, T_mel, T_text)
        step: jnp.ndarray = 0,
        train: bool = True,
    ) -> Tuple:
        """Training forward -> the reference 10-tuple
        (`matcha/model.py:149-199`)."""
        sid_embs, accent_probs = self._speaker_vector(sids, aids, feats, train)

        mu_x, txt_emb, txt_valid = self.encoder(
            text, text_lengths, sid_embs, train=train
        )
        txt_pad = ~txt_valid

        log_duration_prediction = self.duration_predictor(
            mu_x, txt_pad, train=train
        )
        attn_soft, attn_logprob = self.aligner(
            feats, txt_emb, txt_pad, duration, sid_embs
        )
        attn_hard = binarize_attention(attn_soft, text_lengths, feats_lengths)
        attn_hard_dur = attn_hard[:, 0].sum(axis=1)
        attn_out = (attn_soft, attn_hard, attn_hard_dur, attn_logprob)

        T_mel = feats.shape[1]
        mel_valid = ~pad_mask_from_lengths(feats_lengths, T_mel)

        def hard_expand(x):
            if self.use_gaussian:
                return gaussian_upsample(
                    x, attn_hard_dur, h_masks=mel_valid, d_masks=txt_valid
                )
            return length_regulator(x, attn_hard_dur.astype(jnp.int32), T_mel)

        if duration is not None:
            soft = jnp.einsum("bmt,bth->bmh", attn_soft[:, 0], mu_x)
            mu_y = jnp.where(
                step < self.binarization_start_steps, soft, hard_expand(mu_x)
            )
        else:
            mu_y = hard_expand(mu_x)

        mask3 = mel_valid[..., None].astype(feats.dtype)
        dec_outs, u = self.decoder(feats, mask3, mu_y, sid_embs, train=train)

        return (
            dec_outs,
            u,
            mu_y,
            txt_pad,
            mel_valid,
            feats_lengths,
            attn_hard_dur,
            log_duration_prediction,
            attn_out,
            accent_probs,
        )

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
        n_timesteps: int = 10,
        temperature: float = 0.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Euler-ODE synthesis -> (denormalised mel (B, T, n_mels),
        mel_lengths, speaker embedding) (`matcha/model.py:201-250`)."""
        max_mel_frames = fix_len_compatibility(max_mel_frames)
        if spk_embs is not None:
            sid_embs = spk_embs
        elif self.use_cvae:
            if feats is None or aids is None:
                raise ValueError("CVAE inference needs reference feats and aids")
            z_acc, _, z_spk, _, _ = self.speaker_emb(feats, aids, sids, train=False)
            sid_embs = jnp.concatenate([z_acc, z_spk], axis=1)
        else:
            sid_embs = self.speaker_emb(sids)

        mu_x, _, txt_valid = self.encoder(text, text_lengths, sid_embs, train=False)
        txt_pad = ~txt_valid

        log_d = self.duration_predictor(mu_x, txt_pad, train=False)
        duration_rounded = jnp.maximum(
            jnp.round(jnp.exp(log_d) - 1.0) * d_control, 0.0
        ) * (~txt_pad)
        mel_lens = jnp.minimum(duration_rounded.sum(axis=1), max_mel_frames).astype(
            jnp.int32
        )
        mel_valid = ~pad_mask_from_lengths(mel_lens, max_mel_frames)

        if self.use_gaussian:
            mu_y = gaussian_upsample(
                mu_x, duration_rounded, h_masks=mel_valid, d_masks=txt_valid
            )
        else:
            mu_y = length_regulator(
                mu_x, duration_rounded.astype(jnp.int32), max_mel_frames
            )

        mask3 = mel_valid[..., None].astype(mu_y.dtype)
        dec_outs = self.decoder.solve(
            mu_y, mask3, n_timesteps, temperature, sid_embs
        )
        return self.denormalize(dec_outs), mel_lens, sid_embs
