"""espnet-style pre-norm Transformer encoder (used by JETS).

Architecture parity with espnet's
`nets/pytorch_backend/transformer/encoder.py` as instantiated by the
reference (`models/gan_tts/jets/model.py:300-316,443-460`): optional
embedding input, (scaled) interleaved-sinusoid positional encoding, pre-norm
residual blocks with conv1d position-wise layers, final LayerNorm.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

MASK_NEG = -1.0e9
LN_EPS = 1e-12  # espnet LayerNorm epsilon


@functools.lru_cache(maxsize=8)
def interleaved_sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    """Standard transformer PE: sin/cos interleaved by even/odd dims."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


class ScaledPositionalEncoding(nn.Module):
    """x + alpha * PE with learnable scalar alpha (espnet scaled_pos_enc)."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.ones, (1,))
        pe = jnp.asarray(
            interleaved_sinusoid_table(max(self.max_len, x.shape[1]), self.d_model)
        )[: x.shape[1]]
        x = x + alpha * pe[None]
        return nn.Dropout(self.dropout)(x, deterministic=not train)


class EspnetSelfAttention(nn.Module):
    """Standard MHA with espnet's masking (mask (B, 1 or Tq, Tk), True=valid).

    ``attn_implementation="flash"`` routes through the fused Pallas kernel
    (`ops/pallas_attention.py:flash_attention`) — no (B, H, T, T) score
    tensor in HBM in either direction; attention-weight dropout runs
    inside the kernel (on-core PRNG, per-call seed off the "dropout"
    stream)."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    attn_implementation: str = "shift"

    @nn.compact
    def __call__(self, x, valid_mask=None, train: bool = False):
        H, D = self.num_heads, self.d_model // self.num_heads
        B, T, _ = x.shape
        q = nn.Dense(self.d_model, name="linear_q")(x).reshape(B, T, H, D)
        k = nn.Dense(self.d_model, name="linear_k")(x).reshape(B, T, H, D)
        v = nn.Dense(self.d_model, name="linear_v")(x).reshape(B, T, H, D)
        if self.attn_implementation == "flash":
            import jax

            from viet_tts_tpu.ops.pallas_attention import flash_attention

            drop_p, seed = 0.0, None
            if train and self.dropout > 0.0:
                drop_p = self.dropout
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            pad_mask = None if valid_mask is None else ~valid_mask[:, 0]
            ctx = flash_attention(
                q, k, v, 1.0 / float(np.sqrt(D)), pad_mask=pad_mask,
                dropout_p=drop_p, dropout_seed=seed,
            )
            return nn.Dense(self.d_model, name="linear_out")(ctx)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(D, x.dtype)
        )
        if valid_mask is not None:
            scores = jnp.where(valid_mask[:, None], scores, MASK_NEG)
        attn = nn.softmax(scores, axis=-1)
        if valid_mask is not None:
            attn = jnp.where(valid_mask[:, None], attn, 0.0)
        attn = nn.Dropout(self.dropout)(attn, deterministic=not train)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, self.d_model)
        return nn.Dense(self.d_model, name="linear_out")(ctx)


class MultiLayeredConv1d(nn.Module):
    """Position-wise layer as two kernel-k convs (espnet conv1d type)."""

    hidden: int
    d_model: int
    kernel_size: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.hidden, (self.kernel_size,), padding="SAME", name="w_1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return nn.Conv(self.d_model, (self.kernel_size,), padding="SAME", name="w_2")(h)


class EspnetEncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    linear_units: int
    kernel_size: int = 3
    dropout: float = 0.1
    attn_dropout: float = 0.1
    normalize_before: bool = True
    attn_implementation: str = "shift"

    @nn.compact
    def __call__(self, x, valid_mask=None, train: bool = False):
        residual = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x) if self.normalize_before else x
        h = EspnetSelfAttention(
            self.d_model, self.num_heads, self.attn_dropout,
            attn_implementation=self.attn_implementation, name="self_attn",
        )(h, valid_mask, train=train)
        x = residual + nn.Dropout(self.dropout)(h, deterministic=not train)
        if not self.normalize_before:
            x = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x)

        residual = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x) if self.normalize_before else x
        h = MultiLayeredConv1d(
            self.linear_units, self.d_model, self.kernel_size, self.dropout,
            name="feed_forward",
        )(h, train=train)
        x = residual + nn.Dropout(self.dropout)(h, deterministic=not train)
        if not self.normalize_before:
            x = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x)
        return x


def _layer_cls(remat: bool):
    """Optionally wrap EspnetEncoderLayer in per-layer gradient remat (same
    rationale as `nn/conformer.py:_block_cls`: recompute the block in the
    backward sweep instead of storing its fp32 (B, h, T, T) attention
    tensors). `train` is arg 3 counting the module instance as arg 0."""
    if remat:
        return nn.remat(EspnetEncoderLayer, static_argnums=(3,))
    return EspnetEncoderLayer


class EspnetTransformerEncoder(nn.Module):
    """Embedding (optional) + scaled PE + pre-norm blocks + final LN.

    ``valid_mask``: (B, T) True at VALID positions (espnet's non-pad mask).
    """

    d_model: int
    num_heads: int
    linear_units: int
    num_blocks: int
    n_symbols: Optional[int] = None  # None => feature input (decoder use)
    kernel_size: int = 3
    dropout: float = 0.1
    positional_dropout: float = 0.1
    attn_dropout: float = 0.1
    normalize_before: bool = True
    use_scaled_pos_enc: bool = True
    attn_implementation: str = "shift"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,
        valid_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        if self.n_symbols is not None:
            emb = nn.Embed(self.n_symbols, self.d_model, name="embed")(xs)
            emb = emb * (xs != 0)[..., None]  # padding_idx 0
            x = emb
        else:
            x = xs
        if self.use_scaled_pos_enc:
            x = ScaledPositionalEncoding(
                self.d_model, self.positional_dropout, name="pos_enc"
            )(x, train=train)
        else:
            pe = jnp.asarray(
                interleaved_sinusoid_table(max(5000, x.shape[1]), self.d_model)
            )[: x.shape[1]]
            x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype)) + pe[None]
            x = nn.Dropout(self.positional_dropout)(x, deterministic=not train)

        attn_mask = None
        if valid_mask is not None:
            attn_mask = valid_mask[:, None, :]  # (B, 1, T) broadcast over queries
        layer_cls = _layer_cls(self.remat)
        for i in range(self.num_blocks):
            x = layer_cls(
                self.d_model,
                self.num_heads,
                self.linear_units,
                self.kernel_size,
                self.dropout,
                self.attn_dropout,
                self.normalize_before,
                self.attn_implementation,
                name=f"layer_{i}",
            )(x, attn_mask, train)
        if self.normalize_before:
            x = nn.LayerNorm(epsilon=LN_EPS, name="after_norm")(x)
        return x, valid_mask
