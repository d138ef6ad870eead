"""Matcha-TTS flow-matching estimator: 1-D UNet with transformer blocks.

Parity with `models/tts/matcha/sub_layers.py:335-735` +
`blocks/transformer.py` (diffusers BasicTransformerBlock with snakebeta
feed-forward): sinusoidal t-embedding + SiLU MLP, down/mid/up
resnet+transformer stages with stride-2 conv down and transposed-conv up,
skip concatenation, GroupNorm(8)+Mish conv blocks. Feature-last.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

MASK_NEG = -1.0e9


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(nn.softplus(x))


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """(B,) -> (B, dim) (`sub_layers.py:335-350`)."""
    half = dim // 2
    freq = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
    )
    ang = scale * t[:, None] * freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimestepEmbedding(nn.Module):
    time_embed_dim: int

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.time_embed_dim, name="linear_1")(sample)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, name="linear_2")(h)


class Block1D(nn.Module):
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, C); mask: (B, T, 1)."""
        h = nn.Conv(self.dim_out, (3,), padding="SAME", name="conv")(x * mask)
        h = nn.GroupNorm(num_groups=self.groups, name="norm")(h)
        return mish(h) * mask


class ResnetBlock1D(nn.Module):
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, mask, time_emb):
        h = Block1D(self.dim_out, self.groups, name="block1")(x, mask)
        h = h + nn.Dense(self.dim_out, name="mlp")(mish(time_emb))[:, None, :]
        h = Block1D(self.dim_out, self.groups, name="block2")(h, mask)
        return h + nn.Conv(self.dim_out, (1,), name="res_conv")(x * mask)


class SnakeBetaFF(nn.Module):
    """snakebeta feed-forward: proj -> x + sin^2(x*a)/b -> dropout -> proj
    (`blocks/transformer.py:17-133`). Log-scale alpha/beta init zero."""

    inner_dim: int
    dim_out: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.inner_dim, name="proj_in")(x)
        log_alpha = self.param("alpha", nn.initializers.zeros, (self.inner_dim,))
        log_beta = self.param("beta", nn.initializers.zeros, (self.inner_dim,))
        alpha, beta = jnp.exp(log_alpha), jnp.exp(log_beta)
        h = h + (1.0 / (beta + 1e-9)) * jnp.sin(h * alpha) ** 2
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return nn.Dense(self.dim_out, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """Pre-norm self-attention + snakebeta FF (diffusers-style, no
    cross-attention / adanorm in this configuration)."""

    dim: int
    num_heads: int
    head_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, valid_mask=None, train: bool = False):
        inner = self.num_heads * self.head_dim
        h = nn.LayerNorm(name="norm1")(x)
        B, T, _ = x.shape
        q = nn.Dense(inner, use_bias=False, name="to_q")(h).reshape(
            B, T, self.num_heads, self.head_dim
        )
        k = nn.Dense(inner, use_bias=False, name="to_k")(h).reshape(
            B, T, self.num_heads, self.head_dim
        )
        v = nn.Dense(inner, use_bias=False, name="to_v")(h).reshape(
            B, T, self.num_heads, self.head_dim
        )
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(self.head_dim, x.dtype)
        )
        if valid_mask is not None:
            # diffusers ADDS the float mask to the logits (baddbmm beta=1 /
            # sdpa float attn_mask); the reference passes a 0/1 validity
            # mask, so padded keys get a -1 logit handicap, NOT -inf
            # (`sub_layers.py:690-696` + diffusers attention_processor).
            # Mirrored for imported-weight parity.
            scores = scores + valid_mask.astype(scores.dtype)[:, None, None, :]
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=not train)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, inner)
        x = x + nn.Dense(self.dim, name="to_out")(ctx)

        h = nn.LayerNorm(name="norm3")(x)
        x = x + SnakeBetaFF(
            self.dim * 4, self.dim, self.dropout, name="ff"
        )(h, train=train)
        return x


class ConformerBlock(nn.Module):
    """Conformer block for the UNet stages (`blocks/conformer.py:1-40`,
    wrapping the public lucidrains layout): half-step FF -> self-attention
    with clipped relative positions -> conv module -> half-step FF ->
    post-LN. The conv module uses LayerNorm where the torch original uses
    BatchNorm1d -- a stateless choice so the ODE solver needs no mutable
    batch statistics."""

    dim: int
    num_heads: int
    head_dim: int
    dropout: float = 0.0
    ff_mult: int = 1
    conv_expansion: int = 2
    conv_kernel_size: int = 31
    max_rel_pos: int = 512

    @nn.compact
    def __call__(self, x, valid_mask=None, train: bool = False):
        mask = (
            valid_mask[..., None].astype(x.dtype)
            if valid_mask is not None
            else jnp.ones_like(x[..., :1])
        )

        def ff(h, name):
            h = nn.LayerNorm(name=f"{name}_norm")(h)
            h = nn.Dense(self.dim * self.ff_mult, name=f"{name}_in")(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
            h = nn.Dense(self.dim, name=f"{name}_out")(h)
            return nn.Dropout(self.dropout)(h, deterministic=not train)

        x = x + 0.5 * ff(x, "ff1")

        inner = self.num_heads * self.head_dim
        h = nn.LayerNorm(name="attn_norm")(x)
        B, T, _ = x.shape
        q = nn.Dense(inner, name="attn_q")(h).reshape(B, T, self.num_heads, -1)
        k = nn.Dense(inner, name="attn_k")(h).reshape(B, T, self.num_heads, -1)
        v = nn.Dense(inner, name="attn_v")(h).reshape(B, T, self.num_heads, -1)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        # clipped relative-position bias (Shaw), shared across heads' dims
        rel = jnp.clip(
            jnp.arange(T)[None, :] - jnp.arange(T)[:, None],
            -self.max_rel_pos,
            self.max_rel_pos,
        ) + self.max_rel_pos
        rel_emb = self.param(
            "rel_pos_emb",
            nn.initializers.normal(0.02),
            (2 * self.max_rel_pos + 1, self.head_dim),
        )
        scores = scores + jnp.einsum("bqhd,qkd->bhqk", q, rel_emb[rel])
        scores = scores / jnp.sqrt(jnp.asarray(self.head_dim, x.dtype))
        if valid_mask is not None:
            scores = jnp.where(valid_mask[:, None, None, :], scores, MASK_NEG)
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=not train)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, inner)
        x = x + nn.Dropout(self.dropout)(
            nn.Dense(self.dim, name="attn_out")(ctx), deterministic=not train
        )

        h = nn.LayerNorm(name="conv_norm")(x)
        h = nn.Dense(2 * self.dim * self.conv_expansion, name="conv_in")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        h = nn.Conv(
            self.dim * self.conv_expansion,
            (self.conv_kernel_size,),
            feature_group_count=self.dim * self.conv_expansion,
            padding="SAME",
            name="conv_dw",
        )(h * mask)
        h = nn.LayerNorm(name="conv_bn")(h)
        h = nn.silu(h)
        h = nn.Dense(self.dim, name="conv_out")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=not train)

        x = x + 0.5 * ff(x, "ff2")
        return nn.LayerNorm(name="final_norm")(x)


class UNetDecoder(nn.Module):
    """The CFM vector-field estimator (`sub_layers.py:490-735`).

    Inputs/outputs feature-last: x (B, T, n_feats); T must be divisible by
    2^(len(channels)-1) (the loader's fix_len_compatibility guarantee).
    Per-stage `*_block_type` selects transformer or conformer attention
    blocks (`sub_layers.py:501-503,609-635`).
    """

    out_channels: int
    channels: Sequence[int] = (256, 256)
    dropout: float = 0.05
    attention_head_dim: int = 64
    n_blocks: int = 1
    num_mid_blocks: int = 2
    num_heads: int = 2
    down_block_type: str = "transformer"
    mid_block_type: str = "transformer"
    up_block_type: str = "transformer"
    remat: bool = False

    def _block(self, block_type: str, dim: int, name: str):
        cls = ConformerBlock if block_type == "conformer" else BasicTransformerBlock
        if self.remat:
            # per-block gradient remat (same rationale as
            # `nn/conformer.py:_block_cls`); `train` is arg 3 counting the
            # module instance as arg 0 for both block classes
            cls = nn.remat(cls, static_argnums=(3,))
        return cls(
            dim,
            self.num_heads,
            self.attention_head_dim,
            self.dropout,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, C_in) noisy sample
        mask: jnp.ndarray,  # (B, T, 1) float valid
        mu: jnp.ndarray,  # (B, T, n_feats) conditioning
        t: jnp.ndarray,  # (B,) flow time
        spks: Optional[jnp.ndarray] = None,  # (B, spk_dim)
        train: bool = False,
    ) -> jnp.ndarray:
        channels = tuple(self.channels)
        t_emb = sinusoidal_time_embedding(t, x.shape[-1] + mu.shape[-1] + (
            spks.shape[-1] if spks is not None else 0
        ))
        t_emb = TimestepEmbedding(channels[0] * 4, name="time_mlp")(t_emb)

        h = jnp.concatenate([x, mu], axis=-1)
        if spks is not None:
            h = jnp.concatenate(
                [h, jnp.broadcast_to(spks[:, None, :], (h.shape[0], h.shape[1], spks.shape[-1]))],
                axis=-1,
            )

        hiddens = []
        masks = [mask]
        for i, ch in enumerate(channels):
            is_last = i == len(channels) - 1
            m = masks[-1]
            h = ResnetBlock1D(ch, name=f"down_res_{i}")(h, m, t_emb)
            for j in range(self.n_blocks):
                h = self._block(self.down_block_type, ch, f"down_tf_{i}_{j}")(
                    h, m[..., 0] > 0, train
                )
            hiddens.append(h)
            if not is_last:
                h = nn.Conv(ch, (3,), strides=(2,), padding=((1, 1),), name=f"down_conv_{i}")(h * m)
                masks.append(m[:, ::2])
            else:
                h = nn.Conv(ch, (3,), padding="SAME", name=f"down_conv_{i}")(h * m)
                masks.append(m)

        masks = masks[:-1]
        m_mid = masks[-1]
        for i in range(self.num_mid_blocks):
            h = ResnetBlock1D(channels[-1], name=f"mid_res_{i}")(h, m_mid, t_emb)
            for j in range(self.n_blocks):
                h = self._block(
                    self.mid_block_type, channels[-1], f"mid_tf_{i}_{j}"
                )(h, m_mid[..., 0] > 0, train)

        up_channels = channels[::-1] + (channels[0],)
        for i in range(len(up_channels) - 1):
            out_ch = up_channels[i + 1]
            is_last = i == len(up_channels) - 2
            m = masks.pop()
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock1D(out_ch, name=f"up_res_{i}")(h, m, t_emb)
            for j in range(self.n_blocks):
                h = self._block(self.up_block_type, out_ch, f"up_tf_{i}_{j}")(
                    h, m[..., 0] > 0, train
                )
            if not is_last:
                # ConvTranspose1d(4, stride 2, pad 1): exact torch geometry
                import jax

                in_ch = h.shape[-1]
                kernel = self.param(
                    f"up_kernel_{i}",
                    nn.initializers.kaiming_normal(),
                    (4, in_ch, out_ch),
                )
                bias = self.param(
                    f"up_bias_{i}", nn.initializers.zeros, (out_ch,)
                )
                h = (
                    jax.lax.conv_general_dilated(
                        (h * m).astype(kernel.dtype),
                        kernel,
                        window_strides=(1,),
                        padding=[(2, 2)],
                        lhs_dilation=(2,),
                        dimension_numbers=("NWC", "WIO", "NWC"),
                    )
                    + bias
                )
            else:
                h = nn.Conv(out_ch, (3,), padding="SAME", name=f"up_conv_{i}")(h * m)

        m = mask
        h = Block1D(up_channels[-1], name="final_block")(h, m)
        out = nn.Conv(self.out_channels, (1,), name="final_proj")(h * m)
        return out * m
