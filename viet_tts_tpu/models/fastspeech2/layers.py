"""FastSpeech2 sub-modules: predictors, aligner, postnet, CVAE conditioning.

Architecture parity with `models/tts/fastspeech2/layers.py` and
`sublayers.py`; all modules are feature-last flax and mask-aware.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def fairseq_sinusoid_table(num_embeddings: int, dim: int, padding_idx: int = 0) -> np.ndarray:
    """fairseq-style table: [sin | cos] halves concatenated, row pad zeroed
    (`sublayers.py:26-42`)."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000.0) / (half - 1)))
    ang = np.arange(num_embeddings, dtype=np.float64)[:, None] * freq[None, :]
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        emb = np.concatenate([emb, np.zeros((num_embeddings, 1))], axis=1)
    emb[padding_idx] = 0.0
    return emb.astype(np.float32)


def fairseq_positions(ref: jnp.ndarray, padding_idx: int = 0) -> jnp.ndarray:
    """Position ids from a reference signal: non-"pad" entries numbered from
    padding_idx+1 (`function.py:29-39`; the predictor keys off feature 0)."""
    mask = (ref != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


class ConvReluNormStack(nn.Module):
    """[Conv1d -> ReLU -> LayerNorm(eps 1e-12) -> Dropout] x n, masked."""

    n_chans: int
    n_layers: int
    kernel_size: int
    dropout: float
    causal: bool = False  # "SAME" vs left-only padding

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        k = self.kernel_size
        pad = ((k - 1) // 2, (k - 1) // 2) if not self.causal else (k - 1, 0)
        for i in range(self.n_layers):
            x = nn.Conv(self.n_chans, (k,), padding=(pad,), name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-12, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
            if pad_mask is not None:
                x = x * (~pad_mask)[..., None]
        return x


class DurationPredictor(nn.Module):
    """Log-domain duration predictor (`layers.py:359-407`)."""

    n_chans: int = 256
    n_layers: int = 2
    kernel_size: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, xs: jnp.ndarray, pad_mask: Optional[jnp.ndarray] = None, train: bool = False
    ) -> jnp.ndarray:
        h = ConvReluNormStack(
            self.n_chans, self.n_layers, self.kernel_size, self.dropout, name="conv"
        )(xs, pad_mask, train=train)
        out = nn.Dense(1, name="linear")(h)[..., 0]
        if pad_mask is not None:
            out = out * (~pad_mask)
        return out


class VariancePredictor(nn.Module):
    """Pitch/energy predictor with learned-alpha fairseq positions
    (`layers.py:523-568`)."""

    n_chans: int = 256
    n_layers: int = 2
    kernel_size: int = 5
    dropout: float = 0.5
    odim: int = 1

    @nn.compact
    def __call__(self, xs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = xs.shape[-1]
        alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,))
        table = jnp.asarray(fairseq_sinusoid_table(4096, d))
        pos_ids = fairseq_positions(xs[..., 0])
        xs = xs + alpha * table[pos_ids]
        h = ConvReluNormStack(
            self.n_chans, self.n_layers, self.kernel_size, self.dropout, name="conv"
        )(xs, None, train=train)
        out = nn.Dense(self.odim, name="linear")(h)
        return out[..., 0] if self.odim == 1 else out


class AlignmentEncoder(nn.Module):
    """One-TTS-Alignment text/mel aligner (`layers.py:260-356`).

    Negative-L2 Gaussian-isotropic attention scaled by ``temperature``;
    log-softmax over text + log(beta-binomial prior) when given.
    """

    n_att_channels: int
    temperature: float = 0.0005

    @nn.compact
    def __call__(
        self,
        queries: jnp.ndarray,  # (B, T_mel, n_mel) mel features
        keys: jnp.ndarray,  # (B, T_text, C_text) text embeddings
        text_pad_mask: Optional[jnp.ndarray] = None,  # (B, T_text) True=pad
        attn_prior: Optional[jnp.ndarray] = None,  # (B, T_mel, T_text)
        speaker_embed: Optional[jnp.ndarray] = None,  # (B, C_spk)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n_mel = queries.shape[-1]
        c_text = keys.shape[-1]
        if speaker_embed is not None:
            keys = keys + nn.Dense(c_text, name="key_spk_proj")(speaker_embed)[:, None]
            queries = queries + nn.Dense(n_mel, name="query_spk_proj")(
                speaker_embed
            )[:, None]

        k = nn.Conv(c_text * 2, (3,), padding="SAME", name="key_conv1")(keys)
        k = nn.relu(k)
        k = nn.Conv(self.n_att_channels, (1,), name="key_conv2")(k)

        q = nn.Conv(n_mel * 2, (3,), padding="SAME", name="query_conv1")(queries)
        q = nn.relu(q)
        q = nn.Conv(n_mel, (1,), name="query_conv2")(q)
        q = nn.relu(q)
        q = nn.Conv(self.n_att_channels, (1,), name="query_conv3")(q)

        # -temp * ||q_t - k_s||^2, shaped (B, T_mel, T_text)
        sq = (q**2).sum(-1)[:, :, None]
        sk = (k**2).sum(-1)[:, None, :]
        attn = -self.temperature * (sq + sk - 2.0 * jnp.einsum("bmc,btc->bmt", q, k))

        if attn_prior is not None:
            attn = jax.nn.log_softmax(attn, axis=-1) + jnp.log(attn_prior + 1e-8)
        attn_logprob = attn

        if text_pad_mask is not None:
            attn = jnp.where(text_pad_mask[:, None, :], -1.0e9, attn)
        attn_soft = jax.nn.softmax(attn, axis=-1)
        # (B, 1, T_mel, T_text) like the reference
        return attn_soft[:, None], attn_logprob[:, None]


class Postnet(nn.Module):
    """5x [Conv1d(512, k5) + BatchNorm + tanh] residual refiner
    (`layers.py:571-625`); caller adds the residual."""

    n_channels: int
    embedding_dim: int = 512
    conv_layers: int = 5
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.conv_layers - 1):
            x = nn.Conv(
                self.embedding_dim, (self.kernel_size,), padding="SAME", name=f"conv_{i}"
            )(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
            x = jnp.tanh(x)
            x = nn.Dropout(0.5)(x, deterministic=not train)
        x = nn.Conv(
            self.n_channels,
            (self.kernel_size,),
            padding="SAME",
            name=f"conv_{self.conv_layers - 1}",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name=f"bn_{self.conv_layers - 1}")(x)
        return nn.Dropout(0.5)(x, deterministic=not train)


class ReferenceEncoder(nn.Module):
    """GST reference encoder: strided Conv2d stack + GRU over time
    (espnet `gst/style_encoder.py` as used at `layers.py:628-640`)."""

    conv_layers: int = 6
    conv_chans_list: Sequence[int] = (32, 32, 64, 64, 128, 128)
    conv_kernel_size: int = 3
    conv_stride: int = 2
    gru_layers: int = 1
    gru_units: int = 256

    @nn.compact
    def __call__(self, speech: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """speech: (B, T, idim) mel -> (B, gru_units)."""
        x = speech[..., None]  # (B, T, idim, 1) channel-last 2D
        p = (self.conv_kernel_size - 1) // 2
        for i in range(self.conv_layers):
            x = nn.Conv(
                self.conv_chans_list[i],
                (self.conv_kernel_size, self.conv_kernel_size),
                strides=(self.conv_stride, self.conv_stride),
                padding=((p, p), (p, p)),
                use_bias=False,
                name=f"conv_{i}",
            )(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
            x = nn.relu(x)
        B, Tp = x.shape[0], x.shape[1]
        h = x.reshape(B, Tp, -1)
        for i in range(self.gru_layers):
            rnn = nn.RNN(nn.GRUCell(self.gru_units), name=f"gru_{i}")
            h = rnn(h)
        return h[:, -1, :]  # final hidden state


class CVAENet(nn.Module):
    """Conditional-VAE accent + speaker heads (`layers.py:689-821`)."""

    n_accents: int
    n_speakers: int
    y_dim: int = 10
    z_dim: int = 192

    def _head(self, x, label, emb_name, prefix):
        y = nn.Embed(
            self.n_accents if prefix == "acc" else self.n_speakers,
            self.y_dim,
            name=emb_name,
        )(label)
        h = nn.Dense(256, name=f"linear_{prefix}")(jnp.concatenate([x, y], axis=1))
        h = jnp.tanh(h)
        mu = nn.Dense(self.z_dim, name=f"mu_{prefix}")(h)
        logvar = nn.Dense(self.z_dim, name=f"logvar_{prefix}")(h)
        return y, mu, logvar

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        label_acc: jnp.ndarray,
        label_spk: jnp.ndarray,
        train: bool = False,
    ):
        y_acc, mu_acc, logvar_acc = self._head(x, label_acc, "embedding_layer_acc", "acc")
        y_spk, mu_spk, logvar_spk = self._head(x, label_spk, "embedding_layer_spk", "spk")
        if train:
            rng = self.make_rng("reparam")
            r1, r2 = jax.random.split(rng)
            z_acc = mu_acc + jax.random.normal(r1, mu_acc.shape) * jnp.exp(0.5 * logvar_acc)
            z_spk = mu_spk + jax.random.normal(r2, mu_spk.shape) * jnp.exp(0.5 * logvar_spk)
        else:
            z_acc, z_spk = mu_acc, mu_spk
        return z_acc, y_acc, z_spk, y_spk, (mu_acc, logvar_acc, mu_spk, logvar_spk)


class AccentEncoderNetwork(nn.Module):
    """ReferenceEncoder(mel) -> CVAE accent/speaker latents
    (`layers.py:628-687`)."""

    n_speakers: int
    n_accents: int
    z_dim: int
    conv_layers: int = 6
    conv_chans_list: Sequence[int] = (32, 32, 64, 64, 128, 128)
    conv_kernel_size: int = 3
    conv_stride: int = 2
    gru_layers: int = 1
    gru_units: int = 256

    @nn.compact
    def __call__(
        self,
        speech: jnp.ndarray,
        acc_labels: jnp.ndarray,
        spk_labels: jnp.ndarray,
        train: bool = False,
    ):
        ref = ReferenceEncoder(
            self.conv_layers,
            self.conv_chans_list,
            self.conv_kernel_size,
            self.conv_stride,
            self.gru_layers,
            self.gru_units,
            name="encoder",
        )(speech, train=train)
        return CVAENet(
            self.n_accents, self.n_speakers, 10, self.z_dim, name="cvae"
        )(ref, acc_labels, spk_labels, train=train)
