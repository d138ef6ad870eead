"""Matcha-TTS text-encoder layers: RoPE attention, conv prenet, encoder.

Parity with `models/tts/matcha/sub_layers.py:11-333` and `layers.py:11-92`:
channel LayerNorm (eps 1e-4), residual ConvReluNorm prenet with zero-init
projection, rotary embeddings applied to half of each head's dims, post-norm
attention + masked conv FFN, and the mu-projection text encoder. Everything
is feature-last.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

MASK_NEG = -1.0e4  # the reference masks attention scores with -1e4


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the feature axis with eps 1e-4 (`sub_layers.py:11-29`)."""

    channels: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        x = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        return x * gamma + beta


class ConvReluNorm(nn.Module):
    """Residual conv prenet with zero-initialised projection
    (`sub_layers.py:32-65`)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    n_layers: int = 3
    p_dropout: float = 0.5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_mask: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """x: (B, T, C); x_mask: (B, T, 1) float valid mask."""
        x_org = x
        h = x
        for i in range(self.n_layers):
            h = nn.Conv(
                self.hidden_channels,
                (self.kernel_size,),
                padding="SAME",
                name=f"conv_{i}",
            )(h * x_mask)
            h = ChannelLayerNorm(self.hidden_channels, name=f"norm_{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.p_dropout)(h, deterministic=not train)
        proj = nn.Conv(
            self.out_channels,
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(h)
        return (x_org + proj) * x_mask


def rope_rotate(x: jnp.ndarray, rot_dims: int) -> jnp.ndarray:
    """Apply rotary embedding to the first ``rot_dims`` dims of each head.

    x: (B, H, T, D). Follows the labml convention used by the reference
    (`sub_layers.py:67-142`): theta repeated (not interleaved), negative-half
    rotation.
    """
    B, H, T, D = x.shape
    x_rope, x_pass = x[..., :rot_dims], x[..., rot_dims:]
    half = rot_dims // 2
    theta = 1.0 / (10000.0 ** (np.arange(0, rot_dims, 2) / rot_dims))
    pos = jnp.arange(T, dtype=jnp.float32)
    idx_theta = pos[:, None] * jnp.asarray(theta, jnp.float32)[None, :]  # (T, rot/2)
    idx_theta2 = jnp.concatenate([idx_theta, idx_theta], axis=1)  # (T, rot)
    cos = jnp.cos(idx_theta2)[None, None]
    sin = jnp.sin(idx_theta2)[None, None]
    neg_half = jnp.concatenate([-x_rope[..., half:], x_rope[..., :half]], axis=-1)
    x_rope = x_rope * cos + neg_half * sin
    return jnp.concatenate([x_rope, x_pass], axis=-1)


class RoPEMultiHeadAttention(nn.Module):
    """1x1-conv QKV attention with rotary positions on half the head dims
    (`sub_layers.py:174-252`)."""

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,  # (B, 1|T, T) 1=valid
        train: bool = False,
    ) -> jnp.ndarray:
        H = self.n_heads
        D = self.channels // H
        B, T, _ = x.shape
        q = nn.Conv(self.channels, (1,), name="conv_q")(x)
        k = nn.Conv(self.channels, (1,), name="conv_k")(c)
        v = nn.Conv(self.channels, (1,), name="conv_v")(c)

        def heads(z):
            return jnp.swapaxes(z.reshape(B, -1, H, D), 1, 2)  # (B,H,T,D)

        qh, kh, vh = heads(q), heads(k), heads(v)
        rot = int(D * 0.5)
        qh = rope_rotate(qh, rot)
        kh = rope_rotate(kh, rot)

        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
            jnp.asarray(D, x.dtype)
        )
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None] == 0, MASK_NEG, scores)
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.p_dropout)(attn, deterministic=not train)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = jnp.swapaxes(out, 1, 2).reshape(B, T, self.channels)
        return nn.Conv(self.out_channels, (1,), name="conv_o")(out)


class MaskedConvFFN(nn.Module):
    """conv -> relu -> dropout -> conv, masked (`sub_layers.py:145-171`)."""

    filter_channels: int
    out_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        h = nn.Conv(
            self.filter_channels, (self.kernel_size,), padding="SAME", name="conv_1"
        )(x * x_mask)
        h = nn.relu(h)
        h = nn.Dropout(self.p_dropout)(h, deterministic=not train)
        h = nn.Conv(
            self.out_channels, (self.kernel_size,), padding="SAME", name="conv_2"
        )(h * x_mask)
        return h * x_mask


class RoPEEncoder(nn.Module):
    """Post-norm RoPE transformer stack (`sub_layers.py:254-302`)."""

    hidden_channels: int
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        """x: (B, T, C); x_mask: (B, T, 1)."""
        m = x_mask[..., 0]
        attn_mask = m[:, :, None] * m[:, None, :]  # (B, T, T) 1=valid
        for i in range(self.n_layers):
            x = x * x_mask
            y = RoPEMultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                self.p_dropout,
                name=f"attn_{i}",
            )(x, x, attn_mask, train=train)
            y = nn.Dropout(self.p_dropout)(y, deterministic=not train)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm1_{i}")(x + y)
            y = MaskedConvFFN(
                self.filter_channels,
                self.hidden_channels,
                self.kernel_size,
                self.p_dropout,
                name=f"ffn_{i}",
            )(x, x_mask, train=train)
            y = nn.Dropout(self.p_dropout)(y, deterministic=not train)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm2_{i}")(x + y)
        return x * x_mask


class TextEncoder(nn.Module):
    """Embedding + prenet + speaker concat + RoPE encoder + mu projection
    (`matcha/layers.py:11-92`)."""

    n_vocab: int
    n_feats: int
    n_spks: int
    spk_emb_dim: int
    encoder_params: Dict

    @nn.compact
    def __call__(
        self,
        src_seq: jnp.ndarray,
        src_lengths: jnp.ndarray,
        sids: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (mu (B,T,n_feats), raw embedding (B,T,C), valid (B,T))."""
        p = self.encoder_params
        hidden = p["hidden_dim"]
        emb = nn.Embed(
            self.n_vocab,
            hidden,
            embedding_init=nn.initializers.normal(hidden**-0.5),
            name="src_word_emb",
        )(src_seq)
        # the reference scales by sqrt of the POST-concat hidden dim
        # (`matcha/layers.py:39-52,85`: self.hidden_dim is reassigned to
        # hidden+spk_emb_dim before forward reads it) — mirrored
        scale_dim = hidden + (self.spk_emb_dim if self.n_spks > 1 else 0)
        emb = emb * jnp.sqrt(jnp.asarray(scale_dim, emb.dtype))
        T = src_seq.shape[1]
        valid = jnp.arange(T)[None, :] < src_lengths[:, None]
        x_mask = valid[..., None].astype(emb.dtype)

        x = emb
        if p.get("use_prenet", True):
            x = ConvReluNorm(
                hidden,
                hidden,
                kernel_size=p["prenet"]["kernel_size"],
                n_layers=p["prenet"]["n_layers"],
                p_dropout=p["prenet"]["p_dropout"],
                name="prenet",
            )(x, x_mask, train=train)

        if self.n_spks > 1 and sids is not None:
            spk = jnp.broadcast_to(
                sids[:, None, :], (x.shape[0], T, sids.shape[-1])
            )
            x = jnp.concatenate([x, spk], axis=-1)
            hidden = hidden + self.spk_emb_dim

        x = RoPEEncoder(
            hidden,
            filter_channels=p["encoder"]["filter_channels"],
            n_heads=p["encoder"]["n_heads"],
            n_layers=p["encoder"]["n_layers"],
            kernel_size=p["encoder"]["kernel_size"],
            p_dropout=p["encoder"]["p_dropout"],
            name="encoder",
        )(x, x_mask, train=train)

        mu = nn.Conv(self.n_feats, (1,), name="proj_m")(x) * x_mask
        return mu, emb, valid
