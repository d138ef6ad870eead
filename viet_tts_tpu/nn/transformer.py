"""FastSpeech2-style FFT (feed-forward Transformer) blocks in flax.

Architecture parity with `models/tts/fastspeech2/blocks/transformer.py`:
post-norm multi-head self-attention + conv1d position-wise FFN, fixed
sinusoid positions added to the input, padding zeroed after each sub-block.
Feature-last layout throughout; attention runs as one batched einsum on the
MXU instead of the reference's per-head bmm loop.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from viet_tts_tpu.nn.utils import sinusoid_position_table

MASK_NEG = -1.0e9


class MultiHeadAttention(nn.Module):
    """Post-norm MHA: out = LayerNorm(dropout(W_o attn(QKV)) + residual)."""

    num_heads: int
    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        attn_pad_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d_head = self.d_model // self.num_heads
        residual = q

        def proj(x, name):
            y = nn.Dense(self.num_heads * d_head, name=name)(x)
            return y.reshape(*x.shape[:-1], self.num_heads, d_head)

        qh = proj(q, "w_qs")
        kh = proj(k, "w_ks")
        vh = proj(v, "w_vs")

        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(
            jnp.asarray(d_head, qh.dtype)
        )
        if attn_pad_mask is not None:
            # attn_pad_mask: (B, Tq, Tk), True = masked. Large-negative (not
            # -inf) so fully-masked padding query rows stay NaN-free.
            scores = jnp.where(attn_pad_mask[:, None, :, :], MASK_NEG, scores)
        attn = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        ctx = ctx.reshape(*q.shape[:-1], self.num_heads * d_head)

        out = nn.Dense(self.d_model, name="fc")(ctx)
        out = nn.Dropout(self.dropout)(out, deterministic=not train)
        out = nn.LayerNorm(name="layer_norm")(out + residual)
        return out, attn


class ConvFeedForward(nn.Module):
    """Position-wise FFN as two 1-D convs (kernel sizes [k1, k2]), post-norm."""

    d_model: int
    d_inner: int
    kernel_sizes: Sequence[int] = (9, 1)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        h = nn.Conv(self.d_inner, (self.kernel_sizes[0],), padding="SAME", name="w_1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.d_model, (self.kernel_sizes[1],), padding="SAME", name="w_2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return nn.LayerNorm(name="layer_norm")(h + residual)


class FFTBlock(nn.Module):
    """Self-attention + conv FFN with padding zeroed after each sub-block."""

    d_model: int
    num_heads: int
    d_inner: int
    kernel_sizes: Sequence[int] = (9, 1)
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,  # (B, T) True = padding
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        attn_pad_mask = None
        if pad_mask is not None:
            attn_pad_mask = jnp.broadcast_to(
                pad_mask[:, None, :], (x.shape[0], x.shape[1], x.shape[1])
            )
        x, attn = MultiHeadAttention(
            self.num_heads, self.d_model, self.dropout, name="slf_attn"
        )(x, x, x, attn_pad_mask, train=train)
        if pad_mask is not None:
            x = x * (~pad_mask)[..., None]
        x = ConvFeedForward(
            self.d_model, self.d_inner, self.kernel_sizes, self.dropout, name="pos_ffn"
        )(x, train=train)
        if pad_mask is not None:
            x = x * (~pad_mask)[..., None]
        return x, attn


def _block_cls(remat: bool):
    """Optionally wrap FFTBlock in per-layer gradient rematerialisation
    (same rationale as `nn/conformer.py:_block_cls`: drop the stored
    (B, h, T, T) attention tensors from the backward pass). `train` is
    arg 3 counting the module instance as arg 0."""
    if remat:
        return nn.remat(FFTBlock, static_argnums=(3,))
    return FFTBlock


class TransformerEncoder(nn.Module):
    """Phoneme embedding + sinusoid positions + FFT stack.

    Returns (hidden, raw_embedding) like the reference Encoder
    (`blocks/transformer.py:12-88`).
    """

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
    def __call__(
        self, src_seq: jnp.ndarray, pad_mask: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        emb = nn.Embed(self.n_symbols + 1, self.d_model, name="src_word_emb")(src_seq)
        # id 0 = <PAD>: zero its embedding like torch padding_idx
        emb = emb * (src_seq != 0)[..., None]

        T = src_seq.shape[1]
        pos = jnp.asarray(
            sinusoid_position_table(max(self.max_seq_len + 1, T), self.d_model)
        )[:T]
        x = emb + pos[None]
        block_cls = _block_cls(self.remat)
        for i in range(self.n_layers):
            x, _ = block_cls(
                self.d_model,
                self.num_heads,
                self.d_inner,
                self.kernel_sizes,
                self.dropout,
                name=f"layer_{i}",
            )(x, pad_mask, train)
        return x, emb


class TransformerDecoder(nn.Module):
    """Sinusoid positions + FFT stack over frame-level features."""

    n_layers: int
    d_model: int
    max_seq_len: int
    num_heads: int = 2
    d_inner: int = 1024
    kernel_sizes: Sequence[int] = (9, 1)
    dropout: float = 0.2
    remat: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pad_mask: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        T = x.shape[1]
        pos = jnp.asarray(
            sinusoid_position_table(max(self.max_seq_len + 1, T), self.d_model)
        )[:T]
        x = x + pos[None]
        block_cls = _block_cls(self.remat)
        for i in range(self.n_layers):
            x, _ = block_cls(
                self.d_model,
                self.num_heads,
                self.d_inner,
                self.kernel_sizes,
                self.dropout,
                name=f"layer_{i}",
            )(x, pad_mask, train)
        return x, pad_mask
