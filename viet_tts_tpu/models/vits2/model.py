"""VITS2 end-to-end model (flax).

Parity with `models/gan_tts/vits2/generator.py`: speaker-conditioned text
encoder producing prior stats, mel-posterior encoder, transformer coupling
flow, noise-scaled MAS over the negative cross-entropy (on-device
`maximum_path`), SDP or deterministic duration predictor, latent
random-segment slice into the waveform decoder. Inference: SDP reverse ->
ceil durations -> generate_path -> flow reverse -> decode, under a static
frame budget.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from viet_tts_tpu.models.vits2.layers import (
    PosteriorEncoder,
    ResidualCouplingTransformersBlock,
    StochasticDurationPredictor,
    TextEncoder,
    VitsDurationPredictor,
    VitsGenerator,
)
from viet_tts_tpu.nn.utils import valid_mask_from_lengths
from viet_tts_tpu.ops import get_random_segments, maximum_path


def generate_path(duration: jnp.ndarray, y_mask: jnp.ndarray, x_mask: jnp.ndarray):
    """Hard monotonic path from ceil durations (`vits2/utils.py:111-126`).

    duration: (B, T_x); returns (B, T_y, T_x)."""
    cum = jnp.cumsum(duration, axis=-1)
    t_y = jnp.arange(y_mask.shape[1], dtype=cum.dtype)
    path = (t_y[None, :, None] < cum[:, None, :]) & (
        t_y[None, :, None] >= (cum - duration)[:, None, :]
    )
    return path.astype(jnp.float32) * y_mask[..., :1] * x_mask[:, None, :, 0]


class VITS2(nn.Module):
    n_symbols: int
    hparams: Dict[str, Any]
    n_speakers: int = 1
    spec_channels: Optional[int] = None
    mas_noise_scale_initial: float = 0.01
    noise_scale_delta: float = 2e-6

    @staticmethod
    def _posterior_layers(hp) -> int:
        n = int(hp.get("posterior_layers", 16))
        if "posterior_layers" not in hp and hp.get("n_layers_q", 16) != 16:
            import warnings

            warnings.warn(
                f"n_layers_q={hp['n_layers_q']} is ignored (the reference "
                "hardcodes 16 posterior layers; set posterior_layers to "
                "actually change the depth)",
                stacklevel=2,
            )
        return n

    def setup(self):
        hp = self.hparams
        self.segment_size = int(hp.get("segment_size", 8192))
        inter = hp["inter_channels"]
        hidden = hp["hidden_channels"]
        gin = hp.get("gin_channels", 256)
        self.gin_channels = gin
        spec_ch = self.spec_channels or (
            80 if hp.get("use_mel_posterior_encoder", True) else 513
        )
        self.use_sdp = bool(hp.get("use_sdp", True))
        self.use_noise_scaled_mas = bool(hp.get("use_noise_scaled_mas", True))
        use_spk_enc = bool(hp.get("use_spk_conditioned_encoder", False))

        self.enc_p = TextEncoder(
            n_vocab=self.n_symbols,
            out_channels=inter,
            hidden_channels=hidden,
            filter_channels=hp["filter_channels"],
            n_heads=hp["n_heads"],
            n_layers=hp["n_layers"],
            kernel_size=hp["kernel_size"],
            p_dropout=hp["p_dropout"],
            gin_channels=gin if use_spk_enc else 0,
            remat=bool(hp.get("remat", False)),
        )
        self.enc_q = PosteriorEncoder(
            in_channels=spec_ch,
            out_channels=inter,
            hidden_channels=hidden,
            kernel_size=5,
            dilation_rate=1,
            # the reference HARDCODES 16 posterior layers and never reads
            # its config's n_layers_q (`vits2/generator.py:116-123`), so
            # the default mirrors that and shipped-config checkpoints
            # import cleanly; `posterior_layers` (our key, absent from
            # reference configs) overrides it for small/test models
            n_layers=self._posterior_layers(hp),
            gin_channels=gin,
        )
        self.emb_g = nn.Embed(self.n_speakers, gin)
        if self.use_sdp:
            self.dp = StochasticDurationPredictor(
                in_channels=hidden,
                filter_channels=192,
                kernel_size=3,
                p_dropout=0.5,
                n_flows=hp.get("sdp_n_flows", 4),
                gin_channels=gin,
            )
        else:
            self.dp = VitsDurationPredictor(
                filter_channels=256,
                kernel_size=3,
                p_dropout=0.5,
                gin_channels=gin,
            )
        self.dec = VitsGenerator(
            initial_channel=inter,
            resblock=str(hp.get("resblock", "1")),
            resblock_kernel_sizes=tuple(hp["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(map(tuple, hp["resblock_dilation_sizes"])),
            upsample_rates=tuple(hp["upsample_rates"]),
            upsample_initial_channel=hp["upsample_initial_channel"],
            upsample_kernel_sizes=tuple(hp["upsample_kernel_sizes"]),
            gin_channels=gin,
            # inference-only MXU-lane packing (`ops/packed_conv.py`); the
            # serving API injects this key, training configs leave it unset
            packed_tail=bool(hp.get("packed_tail", False)),
        )
        self.flow = ResidualCouplingTransformersBlock(
            channels=inter,
            hidden_channels=hidden,
            kernel_size=5,
            dilation_rate=1,
            n_layers=hp.get("flow_wn_layers", 4),
            n_flows=hp.get("n_flows", 4),
            gin_channels=gin,
            use_transformer_flows=bool(hp.get("use_transformer_flows", True)),
            transformer_flow_type=hp.get("transformer_flow_type", "pre_conv"),
        )
        self.upsample_factor = self.dec.upsample_factor

    def __call__(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        feats: jnp.ndarray,  # (B, T_spec, spec_channels)
        feats_lengths: jnp.ndarray,
        sids: Optional[jnp.ndarray] = None,
        step: jnp.ndarray = 0,
        train: bool = True,
    ) -> Tuple:
        """Training forward -> the reference 8-tuple
        (`vits2/generator.py:178-235`)."""
        g = self.emb_g(sids)  # (B, gin)

        x, m_p, logs_p, x_mask = self.enc_p(text, text_lengths, g=g, train=train)
        z, m_q, logs_q, y_mask = self.enc_q(feats, feats_lengths, g=g, train=train)
        z_p = self.flow(z, y_mask, g=g, train=train)

        # negative cross-entropy for MAS (no gradients)
        zp_sg = jax.lax.stop_gradient(z_p)
        mp_sg = jax.lax.stop_gradient(m_p)
        lp_sg = jax.lax.stop_gradient(logs_p)
        s_p_sq_r = jnp.exp(-2.0 * lp_sg)  # (B, T_text, D)
        neg1 = jnp.sum(
            -0.5 * math.log(2 * math.pi) - lp_sg, axis=-1
        )[:, None, :]  # (B,1,T_text)
        neg2 = jnp.einsum("byd,btd->byt", -0.5 * zp_sg**2, s_p_sq_r)
        neg3 = jnp.einsum("byd,btd->byt", zp_sg, mp_sg * s_p_sq_r)
        neg4 = jnp.sum(-0.5 * (mp_sg**2) * s_p_sq_r, axis=-1)[:, None, :]
        neg_cent = neg1 + neg2 + neg3 + neg4  # (B, T_spec, T_text)
        if self.use_noise_scaled_mas:
            noise_scale = jnp.maximum(
                self.mas_noise_scale_initial - self.noise_scale_delta * step, 0.0
            )
            eps = (
                jnp.std(neg_cent)
                * jax.random.normal(self.make_rng("noise"), neg_cent.shape)
                * noise_scale
            )
            neg_cent = neg_cent + eps

        # on-device MAS in VITS layout (B, T_text, T_spec)
        attn = maximum_path(
            jnp.swapaxes(neg_cent, 1, 2), text_lengths, feats_lengths
        )  # (B, T_text, T_spec)
        attn = jax.lax.stop_gradient(attn)
        w = attn.sum(axis=2)[..., None]  # (B, T_text, 1)

        if self.use_sdp:
            l_length = self.dp(x, x_mask, w=w, g=g, train=train)
            l_length = l_length / jnp.sum(x_mask)
            logw = self.dp.reverse(x, x_mask, g=g, noise_scale=1.0)
            logw_ = jnp.log(w + 1e-6) * x_mask
        else:
            logw_ = jnp.log(w + 1e-6) * x_mask
            logw = self.dp(x, x_mask, g=g, train=train)
            l_length = jnp.sum((logw - logw_) ** 2, axis=(1, 2)) / jnp.sum(x_mask)

        # expand prior stats to frame rate through the hard path
        m_p_y = jnp.einsum("bts,btd->bsd", attn, m_p)
        logs_p_y = jnp.einsum("bts,btd->bsd", attn, logs_p)

        z_slice, ids_slice = get_random_segments(
            jnp.swapaxes(z, 1, 2),
            feats_lengths,
            self.segment_size // self.upsample_factor,
            self.make_rng("segment"),
        )
        o = self.dec(jnp.swapaxes(z_slice, 1, 2), g=g)  # (B, seg, 1)

        return (
            o,
            l_length,
            attn,
            ids_slice,
            x_mask,
            y_mask,
            (z, z_p, m_p_y, logs_p_y, m_q, logs_q),
            (x, logw, logw_),
        )

    def inference(
        self,
        sids: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        max_mel_frames: int,
        d_control: float = 1.0,
        noise_scale: float = 0.0,
        noise_scale_w: float = 0.0,
        seq_sharding=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """SDP-reverse -> ceil durations -> path -> flow reverse -> decode
        (`vits2/generator.py:237-268`). Returns (wav, wav_lengths).
        ``seq_sharding`` time-shards the decoder input (sequence-parallel
        serving, see ``parallel.mesh.seq_sharded``)."""
        z, feats_lengths = self.inference_hidden(
            sids, text, text_lengths, max_mel_frames,
            d_control=d_control, noise_scale=noise_scale,
            noise_scale_w=noise_scale_w,
        )
        if seq_sharding is not None:
            z = jax.lax.with_sharding_constraint(z, seq_sharding)
        wav = self.decode_hidden(z, sids)
        return wav, feats_lengths * self.upsample_factor

    def inference_hidden(
        self,
        sids: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        max_mel_frames: int,
        d_control: float = 1.0,
        noise_scale: float = 0.0,
        noise_scale_w: float = 0.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """`inference` up to the decoder boundary: (z (B, T_y, C),
        feats_lengths). Pairs with `decode_hidden` for chunked streaming
        decode (`infer/streaming.py`); the conv decoder dominates the
        serving graph like the JETS vocoder does."""
        g = self.emb_g(sids)
        x, m_p, logs_p, x_mask = self.enc_p(text, text_lengths, g=g, train=False)
        if self.use_sdp:
            logw = self.dp.reverse(x, x_mask, g=g, noise_scale=noise_scale_w)
        else:
            logw = self.dp(x, x_mask, g=g, train=False)
        w = jnp.exp(logw) * x_mask * d_control
        w_ceil = jnp.ceil(w)[..., 0]  # (B, T_text)
        feats_lengths = jnp.clip(
            w_ceil.sum(axis=-1), 1, max_mel_frames
        ).astype(jnp.int32)
        y_mask = valid_mask_from_lengths(feats_lengths, max_mel_frames)[
            ..., None
        ].astype(x.dtype)

        attn = generate_path(w_ceil, y_mask, x_mask)  # (B, T_y, T_text)
        m_p_y = jnp.einsum("byt,btd->byd", attn, m_p)
        logs_p_y = jnp.einsum("byt,btd->byd", attn, logs_p)

        z_p = (
            m_p_y
            + jax.random.normal(self.make_rng("noise"), m_p_y.shape)
            * jnp.exp(logs_p_y)
            * noise_scale
        )
        z = self.flow(z_p, y_mask, g=g, reverse=True, train=False)
        z = z * y_mask
        return z, feats_lengths

    def decode_hidden(self, z: jnp.ndarray, sids: jnp.ndarray) -> jnp.ndarray:
        """Decoder half of the split inference: z window -> waveform."""
        return self.dec(z, g=self.emb_g(sids))[..., 0]
