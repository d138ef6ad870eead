"""JETS sub-modules: GST style encoder, alignment module, espnet predictors.

Parity targets: espnet `gst/style_encoder.py` (as used at
`jets/model.py:344-357`), `jets/alignments.py:11-59` (AlignmentModule),
espnet `fastspeech/duration_predictor.py` and
`fastspeech2/variance_predictor.py` (`jets/model.py:379-423`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from viet_tts_tpu.models.fastspeech2.layers import ReferenceEncoder


class StyleTokenLayer(nn.Module):
    """Attention over learned style tokens (espnet StyleTokenLayer)."""

    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, ref_embs: jnp.ndarray) -> jnp.ndarray:
        """ref_embs (B, gru_units) -> style embedding (B, gst_token_dim)."""
        B = ref_embs.shape[0]
        tokens = self.param(
            "gst_embs",
            nn.initializers.normal(1.0),
            (self.gst_tokens, self.gst_token_dim // self.gst_heads),
        )
        keys = jnp.tanh(tokens)[None].repeat(B, axis=0)  # (B, n_tok, dim/h)
        q = nn.Dense(self.gst_token_dim, name="linear_q")(ref_embs[:, None])
        k = nn.Dense(self.gst_token_dim, name="linear_k")(keys)
        v = nn.Dense(self.gst_token_dim, name="linear_v")(keys)
        H = self.gst_heads
        D = self.gst_token_dim // H
        qh = q.reshape(B, 1, H, D)
        kh = k.reshape(B, self.gst_tokens, H, D)
        vh = v.reshape(B, self.gst_tokens, H, D)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(
            jnp.asarray(D, q.dtype)
        )
        attn = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, 1, self.gst_token_dim)
        return nn.Dense(self.gst_token_dim, name="linear_out")(ctx)[:, 0]


class StyleEncoder(nn.Module):
    """ReferenceEncoder(mel) + StyleTokenLayer -> global style vector."""

    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4
    conv_layers: int = 6
    conv_chans_list: Sequence[int] = (32, 32, 64, 64, 128, 128)
    conv_kernel_size: int = 3
    conv_stride: int = 2
    gru_layers: int = 1
    gru_units: int = 128

    @nn.compact
    def __call__(self, speech: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ref = ReferenceEncoder(
            self.conv_layers,
            self.conv_chans_list,
            self.conv_kernel_size,
            self.conv_stride,
            self.gru_layers,
            self.gru_units,
            name="ref_enc",
        )(speech, train=train)
        return StyleTokenLayer(
            self.gst_tokens, self.gst_token_dim, self.gst_heads, name="stl"
        )(ref)


class AlignmentModule(nn.Module):
    """Learned text/mel alignment scores (`jets/alignments.py:11-59`).

    Returns log-softmax over text of -||feat_t - text_s||2.
    """

    adim: int

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,  # (B, T_text, adim)
        feats: jnp.ndarray,  # (B, T_feats, odim)
        text_pad_mask: Optional[jnp.ndarray] = None,  # True = pad
    ) -> jnp.ndarray:
        t = nn.Conv(self.adim, (3,), padding="SAME", name="t_conv1")(text)
        t = nn.relu(t)
        t = nn.Conv(self.adim, (1,), name="t_conv2")(t)

        f = nn.Conv(self.adim, (3,), padding="SAME", name="f_conv1")(feats)
        f = nn.relu(f)
        f = nn.Conv(self.adim, (3,), padding="SAME", name="f_conv2")(f)
        f = nn.relu(f)
        f = nn.Conv(self.adim, (1,), name="f_conv3")(f)

        # -||f_t - t_s||_2 as matmul-friendly expansion
        sq_f = (f**2).sum(-1)[:, :, None]
        sq_t = (t**2).sum(-1)[:, None, :]
        dist2 = jnp.maximum(sq_f + sq_t - 2.0 * jnp.einsum("bmc,bsc->bms", f, t), 0.0)
        score = -jnp.sqrt(dist2 + 1e-12)
        if text_pad_mask is not None:
            score = jnp.where(text_pad_mask[:, None, :], -1.0e9, score)
        return jax.nn.log_softmax(score, axis=-1)


class EspnetDurationPredictor(nn.Module):
    """Log-domain duration predictor; masks applied only at the output
    (espnet semantics, unlike the in-repo FS2 variant)."""

    n_layers: int = 2
    n_chans: int = 256
    kernel_size: int = 3
    dropout: float = 0.1
    offset: float = 1.0

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
        is_inference: bool = False,
        train: bool = False,
    ) -> jnp.ndarray:
        h = xs
        for i in range(self.n_layers):
            h = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME", name=f"conv_{i}")(h)
            h = nn.relu(h)
            h = nn.LayerNorm(epsilon=1e-12, name=f"ln_{i}")(h)
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
        out = nn.Dense(1, name="linear")(h)[..., 0]
        if is_inference:
            out = jnp.maximum(jnp.round(jnp.exp(out) - self.offset), 0.0)
        if pad_mask is not None:
            out = out * (~pad_mask)
        return out


class EspnetVariancePredictor(nn.Module):
    """Pitch/energy predictor (espnet fastspeech2 VariancePredictor)."""

    n_layers: int = 2
    n_chans: int = 256
    kernel_size: int = 3
    dropout: float = 0.5
    odim: int = 1

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,  # (B, T) True = pad
        train: bool = False,
    ) -> jnp.ndarray:
        h = xs
        for i in range(self.n_layers):
            h = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME", name=f"conv_{i}")(h)
            h = nn.relu(h)
            h = nn.LayerNorm(epsilon=1e-12, name=f"ln_{i}")(h)
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
        out = nn.Dense(self.odim, name="linear")(h)  # (B, T, odim)
        if pad_mask is not None:
            out = out * (~pad_mask)[..., None]
        return out


class VarianceEmbed(nn.Module):
    """Continuous-value conv embedding for pitch/energy
    (`jets/model.py:396-423`)."""

    adim: int
    kernel_size: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, v: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """v: (B, T, 1) -> (B, T, adim)."""
        h = nn.Conv(self.adim, (self.kernel_size,), padding="SAME", name="conv")(v)
        return nn.Dropout(self.dropout)(h, deterministic=not train)
