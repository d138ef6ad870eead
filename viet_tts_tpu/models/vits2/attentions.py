"""VITS2 attention encoder: windowed relative-position MHA + conv FFN.

Parity with `models/gan_tts/vits2/attentions.py:11-430`: shared-head
relative embeddings within a window of 4, the relative<->absolute shift
trick, speaker (gin) injection at layer index 2, post-norm blocks, masked
conv FFN. Feature-last.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

MASK_NEG = -1.0e4


def _relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, 2L-1) -> (B, H, L, L) (`attentions.py:330-349`)."""
    B, H, L, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(B, H, L * 2 * L)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, L - 1)))
    return x_flat.reshape(B, H, L + 1, 2 * L - 1)[:, :, :L, L - 1 :]


def _absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, L) -> (B, H, L, 2L-1) (`attentions.py:351-365`)."""
    B, H, L, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, L - 1)))
    x_flat = x.reshape(B, H, L * L + L * (L - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (L, 0)))
    return x_flat.reshape(B, H, L, 2 * L)[:, :, :, 1:]


class RelPosMultiHeadAttention(nn.Module):
    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: Optional[int] = 4
    heads_share: bool = True

    @nn.compact
    def __call__(self, x, c, attn_mask=None, train: bool = False):
        """x, c: (B, T, C); attn_mask: (B, Tq, Tk) 1 = attend."""
        H = self.n_heads
        D = self.channels // H
        B, T, _ = x.shape

        q = nn.Conv(self.channels, (1,), name="conv_q")(x)
        k = nn.Conv(self.channels, (1,), name="conv_k")(c)
        v = nn.Conv(self.channels, (1,), name="conv_v")(c)

        qh = jnp.swapaxes(q.reshape(B, -1, H, D), 1, 2)  # (B,H,Tq,D)
        kh = jnp.swapaxes(k.reshape(B, -1, H, D), 1, 2)
        vh = jnp.swapaxes(v.reshape(B, -1, H, D), 1, 2)

        scale = jnp.sqrt(jnp.asarray(D, x.dtype))
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh / scale, kh)

        if self.window_size is not None:
            n_rel = 1 if self.heads_share else H
            init = nn.initializers.normal(D**-0.5)
            emb_rel_k = self.param(
                "emb_rel_k", init, (n_rel, 2 * self.window_size + 1, D)
            )
            emb_rel_v = self.param(
                "emb_rel_v", init, (n_rel, 2 * self.window_size + 1, D)
            )
            rel_k = self._relative_embeddings(emb_rel_k, T)
            rel_logits = jnp.einsum("bhld,nmd->bhlm", qh / scale, rel_k)
            scores = scores + _relative_to_absolute(rel_logits)

        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None] == 0, MASK_NEG, scores)
        p_attn = nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout)(p_attn, deterministic=not train)
        out = jnp.einsum("bhqk,bhkd->bhqd", p_attn, vh)

        if self.window_size is not None:
            rel_w = _absolute_to_relative(p_attn)
            rel_v = self._relative_embeddings(emb_rel_v, T)
            out = out + jnp.einsum("bhlm,nmd->bhld", rel_w, rel_v)

        out = jnp.swapaxes(out, 1, 2).reshape(B, T, self.channels)
        return nn.Conv(self.out_channels, (1,), name="conv_o")(out)

    def _relative_embeddings(self, emb: jnp.ndarray, length: int) -> jnp.ndarray:
        """Slice/pad the (n, 2w+1, d) table to (n, 2*length-1, d)
        (`attentions.py:312-328`)."""
        w = self.window_size
        pad_len = max(length - (w + 1), 0)
        start = max((w + 1) - length, 0)
        if pad_len > 0:
            emb = jnp.pad(emb, ((0, 0), (pad_len, pad_len), (0, 0)))
        return emb[:, start : start + 2 * length - 1]


class MaskedFFN(nn.Module):
    filter_channels: int
    out_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.0
    causal: bool = False

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        pad = (
            [(self.kernel_size - 1, 0)] if self.causal else "SAME"
        )  # `attentions.py:418-431`
        h = nn.Conv(
            self.filter_channels, (self.kernel_size,), padding=pad, name="conv_1"
        )(x * x_mask)
        h = nn.relu(h)
        h = nn.Dropout(self.p_dropout)(h, deterministic=not train)
        h = nn.Conv(
            self.out_channels, (self.kernel_size,), padding=pad, name="conv_2"
        )(h * x_mask)
        return h * x_mask


class VitsEncoder(nn.Module):
    """Post-norm rel-pos transformer stack with gin injection at layer 2
    (`attentions.py:11-91`)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 3
    p_dropout: float = 0.1
    window_size: Optional[int] = 4
    gin_channels: int = 0
    cond_layer_idx: int = 2
    # per-layer gradient rematerialisation (hparams["remat"]): only the
    # layer INPUT is saved; the (B, h, T, T) rel-pos attention tensors are
    # recomputed in the backward sweep instead of round-tripping HBM.
    # Lifted over a method-level function so the inlined attn_i/norm*_i/
    # ffn_i parameter names (and importer compatibility) are unchanged.
    remat: bool = False

    @nn.compact
    def __call__(self, x, x_mask, g=None, train: bool = False):
        """x: (B, T, C); x_mask: (B, T, 1); g: (B, gin) or None."""
        m = x_mask[..., 0]
        attn_mask = m[:, :, None] * m[:, None, :]
        x = x * x_mask

        def layer(mdl, x, attn_mask, x_mask, i, train):
            y = RelPosMultiHeadAttention(
                mdl.hidden_channels,
                mdl.hidden_channels,
                mdl.n_heads,
                mdl.p_dropout,
                mdl.window_size,
                name=f"attn_{i}",
            )(x, x, attn_mask, train=train)
            y = nn.Dropout(mdl.p_dropout)(y, deterministic=not train)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(x + y)
            y = MaskedFFN(
                mdl.filter_channels,
                mdl.hidden_channels,
                mdl.kernel_size,
                mdl.p_dropout,
                name=f"ffn_{i}",
            )(x, x_mask, train=train)
            y = nn.Dropout(mdl.p_dropout)(y, deterministic=not train)
            return nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(x + y)

        layer_fn = (
            nn.remat(layer, static_argnums=(4, 5)) if self.remat else layer
        )
        for i in range(self.n_layers):
            if (
                i == self.cond_layer_idx
                and g is not None
                and self.gin_channels > 0
            ):
                x = x + nn.Dense(self.hidden_channels, name="spk_emb_linear")(g)[
                    :, None, :
                ]
                x = x * x_mask
            x = layer_fn(self, x, attn_mask, x_mask, i, train)
        return x * x_mask


class CausalFFT(nn.Module):
    """Decoder-style stack: causal self-attention + causal conv FFN, with a
    WN-style gated speaker injection before every layer
    (`attentions.py:556-643`; used by the `fft` coupling flow)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int = 1
    kernel_size: int = 1
    p_dropout: float = 0.0
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, train: bool = False):
        """x: (B, T, C); x_mask: (B, T, 1); g: (B, gin) or None."""
        T = x.shape[1]
        m = x_mask[..., 0]
        attn_mask = (
            jnp.tril(jnp.ones((T, T), x.dtype))[None]
            * m[:, :, None]
            * m[:, None, :]
        )
        use_cond = g is not None and self.gin_channels > 0
        if use_cond:
            # one projection produces all layers' gate parameters; a shared
            # 1x1 conv re-embeds x before each gate (`attentions.py:579-585`)
            g_all = nn.Dense(
                2 * self.hidden_channels * self.n_layers, name="cond_layer"
            )(g)
            cond_pre = nn.Conv(2 * self.hidden_channels, (1,), name="cond_pre")
        x = x * x_mask
        for i in range(self.n_layers):
            if use_cond:
                xc = cond_pre(x)
                g_l = g_all[:, None, 2 * self.hidden_channels * i :]
                g_l = g_l[..., : 2 * self.hidden_channels]
                acts = xc + g_l
                x = jnp.tanh(acts[..., : self.hidden_channels]) * nn.sigmoid(
                    acts[..., self.hidden_channels :]
                )
            y = RelPosMultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                self.p_dropout,
                window_size=None,
                name=f"attn_{i}",
            )(x, x, attn_mask, train=train)
            y = nn.Dropout(self.p_dropout)(y, deterministic=not train)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm0_{i}")(x + y)
            y = MaskedFFN(
                self.filter_channels,
                self.hidden_channels,
                self.kernel_size,
                self.p_dropout,
                causal=True,
                name=f"ffn_{i}",
            )(x, x_mask, train=train)
            y = nn.Dropout(self.p_dropout)(y, deterministic=not train)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(x + y)
        return x * x_mask
