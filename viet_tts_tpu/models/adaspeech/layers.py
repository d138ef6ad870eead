"""AdaSpeech sub-modules: conditional layer norm, acoustic condition encoders.

Parity with `models/tts/adaspeech/blocks/cln.py` (zero-init scale/bias
projections so CLN starts as plain LayerNorm), `adaspeech/layers.py:307-455`
(UtteranceEncoder avg-pooled over time, PhonemeLevelEncoder/Predictor with
4-d latents), and the CLN FFT blocks of `adaspeech/blocks/transformer.py`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from viet_tts_tpu.nn.transformer import MASK_NEG


class ConditionalLayerNorm(nn.Module):
    """LayerNorm whose scale/bias come from the speaker embedding."""

    outdims: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, spk: jnp.ndarray) -> jnp.ndarray:
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        scale = nn.Dense(
            self.outdims,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
            name="W_scale",
        )(spk)
        bias = nn.Dense(
            self.outdims,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="W_bias",
        )(spk)
        return y * scale[:, None, :] + bias[:, None, :]


class CLNMultiHeadAttention(nn.Module):
    """Post-CLN MHA (the FS2 block with LayerNorm -> CLN)."""

    num_heads: int
    d_model: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, spk, attn_pad_mask=None, train: bool = False):
        d_head = self.d_model // self.num_heads
        residual = x

        def proj(z, name):
            y = nn.Dense(self.num_heads * d_head, name=name)(z)
            return y.reshape(*z.shape[:-1], self.num_heads, d_head)

        qh, kh, vh = proj(x, "w_qs"), proj(x, "w_ks"), proj(x, "w_vs")
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(
            jnp.asarray(d_head, x.dtype)
        )
        if attn_pad_mask is not None:
            scores = jnp.where(attn_pad_mask[:, None], MASK_NEG, scores)
        attn = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(
            *x.shape[:-1], self.num_heads * d_head
        )
        out = nn.Dense(self.d_model, name="fc")(ctx)
        out = nn.Dropout(self.dropout)(out, deterministic=not train)
        return ConditionalLayerNorm(self.d_model, name="cln")(out + residual, spk)


class CLNConvFeedForward(nn.Module):
    d_model: int
    d_inner: int
    kernel_sizes: Sequence[int] = (9, 1)
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, spk, train: bool = False):
        residual = x
        h = nn.Conv(self.d_inner, (self.kernel_sizes[0],), padding="SAME", name="w_1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.d_model, (self.kernel_sizes[1],), padding="SAME", name="w_2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return ConditionalLayerNorm(self.d_model, name="cln")(h + residual, spk)


class CLNFFTBlock(nn.Module):
    d_model: int
    num_heads: int
    d_inner: int
    kernel_sizes: Sequence[int] = (9, 1)
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, spk, pad_mask=None, train: bool = False):
        attn_pad_mask = None
        if pad_mask is not None:
            attn_pad_mask = jnp.broadcast_to(
                pad_mask[:, None, :], (x.shape[0], x.shape[1], x.shape[1])
            )
        x = CLNMultiHeadAttention(
            self.num_heads, self.d_model, self.dropout, name="slf_attn"
        )(x, spk, attn_pad_mask, train=train)
        if pad_mask is not None:
            x = x * (~pad_mask)[..., None]
        x = CLNConvFeedForward(
            self.d_model, self.d_inner, self.kernel_sizes, self.dropout, name="pos_ffn"
        )(x, spk, train=train)
        if pad_mask is not None:
            x = x * (~pad_mask)[..., None]
        return x


def _block_cls(remat: bool):
    """Optionally wrap CLNFFTBlock in per-layer gradient remat (same
    rationale as `nn/conformer.py:_block_cls`). `train` is arg 4 counting
    the module instance as arg 0."""
    if remat:
        return nn.remat(CLNFFTBlock, static_argnums=(4,))
    return CLNFFTBlock


class CLNTransformerEncoder(nn.Module):
    """Embedding + sinusoid positions + CLN FFT stack."""

    n_symbols: int
    n_layers: int
    d_model: int
    max_seq_len: int
    num_heads: int = 2
    d_inner: int = 1024
    kernel_sizes: Sequence[int] = (9, 1)
    dropout: float = 0.2
    remat: bool = False

    @nn.compact
    def __call__(self, src_seq, pad_mask, spk, train: bool = False):
        from viet_tts_tpu.nn.utils import sinusoid_position_table

        emb = nn.Embed(self.n_symbols + 1, self.d_model, name="src_word_emb")(src_seq)
        emb = emb * (src_seq != 0)[..., None]
        T = src_seq.shape[1]
        pos = jnp.asarray(
            sinusoid_position_table(max(self.max_seq_len + 1, T), self.d_model)
        )[:T]
        x = emb + pos[None]
        block_cls = _block_cls(self.remat)
        for i in range(self.n_layers):
            x = block_cls(
                self.d_model,
                self.num_heads,
                self.d_inner,
                self.kernel_sizes,
                self.dropout,
                name=f"layer_{i}",
            )(x, spk, pad_mask, train)
        return x, emb


class CLNTransformerDecoder(nn.Module):
    n_layers: int
    d_model: int
    max_seq_len: int
    num_heads: int = 2
    d_inner: int = 1024
    kernel_sizes: Sequence[int] = (9, 1)
    dropout: float = 0.2
    remat: bool = False

    @nn.compact
    def __call__(self, x, pad_mask, spk, train: bool = False):
        from viet_tts_tpu.nn.utils import sinusoid_position_table

        T = x.shape[1]
        pos = jnp.asarray(
            sinusoid_position_table(max(self.max_seq_len + 1, T), self.d_model)
        )[:T]
        x = x + pos[None]
        block_cls = _block_cls(self.remat)
        for i in range(self.n_layers):
            x = block_cls(
                self.d_model,
                self.num_heads,
                self.d_inner,
                self.kernel_sizes,
                self.dropout,
                name=f"layer_{i}",
            )(x, spk, pad_mask, train)
        return x, pad_mask


class _ConvLNStack(nn.Module):
    """[strided Conv1d -> ReLU -> LayerNorm(1e-12) -> Dropout] x2."""

    n_chans: int
    kernel_size: int
    stride: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(
                self.n_chans,
                (self.kernel_size,),
                strides=(self.stride,),
                padding=(((self.kernel_size - 1) // 2,) * 2,),
                name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-12, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


class UtteranceEncoder(nn.Module):
    """mel (B, T, idim) -> global vector (B, 1, n_chans) via avg pool."""

    n_chans: int = 256
    kernel_size: int = 5
    stride: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, mel, train: bool = False):
        h = _ConvLNStack(
            self.n_chans, self.kernel_size, self.stride, self.dropout, name="conv"
        )(mel, train=train)
        return h.mean(axis=1, keepdims=True)


class PhonemeLevelEncoder(nn.Module):
    """Duration-averaged mels (B, T_text, idim) -> latents (B, T_text, 4)."""

    n_chans: int = 256
    kernel_size: int = 3
    dropout: float = 0.5
    phn_latent_dim: int = 4

    @nn.compact
    def __call__(self, avg_mels, train: bool = False):
        h = _ConvLNStack(self.n_chans, self.kernel_size, 1, self.dropout, name="conv")(
            avg_mels, train=train
        )
        return nn.Dense(self.phn_latent_dim, name="linear")(h)


class PhonemeLevelPredictor(nn.Module):
    """Encoder states (B, T_text, idim) -> predicted latents (B, T_text, 4)."""

    n_chans: int = 256
    kernel_size: int = 3
    dropout: float = 0.5
    phn_latent_dim: int = 4

    @nn.compact
    def __call__(self, xs, train: bool = False):
        h = _ConvLNStack(self.n_chans, self.kernel_size, 1, self.dropout, name="conv")(
            xs, train=train
        )
        return nn.Dense(self.phn_latent_dim, name="linear")(h)
