"""espnet-style Conformer encoder ("latest" + "legacy" rel-pos) for JETS.

Parity target: espnet `nets/pytorch_backend/conformer/encoder.py` as
instantiated at `models/gan_tts/jets/model.py:317-341,460-482`
(pos_enc_layer_type=rel_pos or legacy_rel_pos, swish activation, macaron
style, CNN module, conv1d positionwise layers). Components:

- RelPositionalEncoding: x * sqrt(d) plus a (2T-1)-long symmetric position
  embedding handed to attention; the legacy flavour uses a T-long positive
  table and the older relative shift
- RelPositionMultiHeadedAttention: Transformer-XL content/position scores
  with learned pos_bias_u/v
- ConvolutionModule: pointwise(2x) -> GLU -> depthwise -> BatchNorm -> swish
  -> pointwise
- positionwise feed-forward: espnet's MultiLayeredConv1d (two convs + relu)
  when ffn_type="conv1d" (the reference's config), Linear+swish otherwise
- macaron feed-forwards at 0.5 residual weight, pre-norm, final LayerNorm
  (espnet LayerNorm eps=1e-12 throughout).
"""

from __future__ import annotations

import functools
import jax
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

MASK_NEG = -1.0e9
LN_EPS = 1e-12  # espnet LayerNorm epsilon


@functools.lru_cache(maxsize=8)
def rel_positional_table(t: int, d_model: int) -> np.ndarray:
    """Symmetric table for positions T-1 .. -(T-1), shape (2T-1, d)."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((2 * t - 1, d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """espnet 'latest' relative shift: (B, H, T, 2T-1) -> (B, H, T, T)."""
    B, H, T, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(B, H, 2 * T, T)
    x = x[:, :, 1:].reshape(B, H, T, 2 * T - 1)
    return x[:, :, :, :T]


def _legacy_rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """espnet 'legacy' relative shift: (B, H, T, T) -> (B, H, T, T)."""
    B, H, T, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # (B, H, T, T+1)
    x = x.reshape(B, H, T + 1, T)
    return x[:, :, 1:].reshape(B, H, T, T)


class RelPositionMultiHeadedAttention(nn.Module):
    """espnet rel-pos MHA ("latest" symmetric-table or "legacy" XL shift).

    ``attn_implementation`` (all paths mathematically identical, pinned in
    `tests/test_espnet_attention.py`):

    - "shift": the reference's padded-reshape shift — materialises an
      extra (B, H, T, 2T-1) (latest) or (B, H, T, T) (legacy) copy.
      Parity default.
    - "dense": factorized scores (`ops/espnet_attention.py` /
      `ops/xl_attention.py`) — plain matmuls, no shift copies;
      attention-weight dropout still applies.
    - "flash": the fused Pallas kernels (`ops/pallas_attention.py`) — the
      (B, H, T, T) tensor never reaches HBM in either direction; weight
      dropout runs inside the kernel (on-core PRNG, one per-call seed off
      the "dropout" stream). The post-softmax zeroing of invalid keys is
      a no-op for any row with a valid key and is skipped inside the
      kernel.
    """

    d_model: int
    num_heads: int
    dropout: float = 0.0
    legacy: bool = False
    attn_implementation: str = "shift"

    @nn.compact
    def __call__(self, x, pos_emb, valid_mask=None, train: bool = False):
        H, D = self.num_heads, self.d_model // self.num_heads
        B, T, _ = x.shape
        q = nn.Dense(self.d_model, name="linear_q")(x).reshape(B, T, H, D)
        k = nn.Dense(self.d_model, name="linear_k")(x).reshape(B, T, H, D)
        v = nn.Dense(self.d_model, name="linear_v")(x).reshape(B, T, H, D)
        linear_pos = nn.Dense(self.d_model, use_bias=False, name="linear_pos")

        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (H, D))
        w = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (H, D))
        scale = 1.0 / jnp.sqrt(jnp.asarray(D, x.dtype))

        impl = self.attn_implementation

        if impl != "shift":
            # static float: the Pallas kernel closes over scale at trace
            # time (a traced jnp scalar would ConcretizationTypeError)
            scale = 1.0 / math.sqrt(D)
            # factorized paths: pull the linear_pos kernel onto the query
            # side (identity feed creates + reads the flax param; E x E,
            # negligible) and dot against the raw sinusoid table
            from viet_tts_tpu.ops.espnet_attention import (
                espnet_rel_scores_latest,
                neg_rel_table,
                rel_pos_queries_latest,
            )
            from viet_tts_tpu.ops.xl_attention import (
                xl_attention_scores,
                xl_pos_queries,
            )

            table = pos_emb[0]
            pos_kernel = linear_pos(jnp.eye(table.shape[-1], dtype=x.dtype))
            # valid_mask here is (B, T) (the conformer layers get it raw;
            # the broadcast to (B, 1, 1, T) happens at score time)
            pad_mask = None if valid_mask is None else ~valid_mask
            drop_p, seed = 0.0, None
            if impl == "flash" and train and self.dropout > 0.0:
                drop_p = self.dropout
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            if self.legacy:
                gA, gB = xl_pos_queries(q + w, pos_kernel)
                if impl == "flash":
                    from viet_tts_tpu.ops.pallas_attention import (
                        flash_xl_attention,
                    )

                    ctx = flash_xl_attention(
                        q + u, k, v, gA, gB, table, scale,
                        pad_mask=pad_mask, dropout_p=drop_p,
                        dropout_seed=seed,
                    )
                    return nn.Dense(self.d_model, name="linear_out")(ctx)
                scores = xl_attention_scores(q + u, k, gA, gB, table, scale)
            else:
                g = rel_pos_queries_latest(q + w, pos_kernel)
                neg = neg_rel_table(table)
                if impl == "flash":
                    from viet_tts_tpu.ops.pallas_attention import (
                        flash_rel_attention,
                    )

                    ctx = flash_rel_attention(
                        q + u, k, v, g, neg, scale, pad_mask=pad_mask,
                        dropout_p=drop_p, dropout_seed=seed,
                    )
                    return nn.Dense(self.d_model, name="linear_out")(ctx)
                scores = espnet_rel_scores_latest(q + u, k, g, neg, scale)
        else:
            p = linear_pos(pos_emb).reshape(1, -1, H, D)
            matrix_ac = jnp.einsum("bqhd,bkhd->bhqk", q + u, k)
            matrix_bd = jnp.einsum(
                "bqhd,bkhd->bhqk",
                q + w,
                jnp.broadcast_to(p, (B, p.shape[1], H, D)),
            )
            matrix_bd = (
                _legacy_rel_shift(matrix_bd)
                if self.legacy
                else _rel_shift(matrix_bd)
            )
            scores = (matrix_ac + matrix_bd) * scale

        if valid_mask is not None:
            scores = jnp.where(valid_mask[:, None, None, :], scores, MASK_NEG)
        attn = nn.softmax(scores, axis=-1)
        if valid_mask is not None:
            attn = jnp.where(valid_mask[:, None, None, :], attn, 0.0)
        attn = nn.Dropout(self.dropout)(attn, deterministic=not train)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, self.d_model)
        return nn.Dense(self.d_model, name="linear_out")(ctx)


class EspnetConvModule(nn.Module):
    d_model: int
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(2 * self.d_model, (1,), name="pointwise_conv1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        h = nn.Conv(
            self.d_model,
            (self.kernel_size,),
            padding="SAME",
            feature_group_count=self.d_model,
            name="depthwise_conv",
        )(h)
        h = nn.BatchNorm(use_running_average=not train, name="norm")(h)
        h = h * nn.sigmoid(h)  # swish
        return nn.Conv(self.d_model, (1,), name="pointwise_conv2")(h)


class EspnetConformerLayer(nn.Module):
    d_model: int
    num_heads: int
    linear_units: int
    kernel_size: int = 7
    dropout: float = 0.1
    attn_dropout: float = 0.1
    macaron: bool = True
    ffn_type: str = "conv1d"  # espnet positionwise_layer_type
    ffn_kernel: int = 1
    legacy: bool = False
    attn_implementation: str = "shift"

    @nn.compact
    def __call__(self, x, pos_emb, valid_mask=None, train: bool = False):
        def ff(name, z):
            h = nn.LayerNorm(epsilon=LN_EPS, name=f"norm_{name}")(z)
            if self.ffn_type == "conv1d":
                # espnet MultiLayeredConv1d: conv -> relu -> dropout -> conv
                h = nn.Conv(
                    self.linear_units, (self.ffn_kernel,), padding="SAME",
                    name=f"{name}_w_1",
                )(h)
                h = nn.relu(h)
                h = nn.Dropout(self.dropout)(h, deterministic=not train)
                h = nn.Conv(
                    self.d_model, (self.ffn_kernel,), padding="SAME",
                    name=f"{name}_w_2",
                )(h)
            else:
                h = nn.Dense(self.linear_units, name=f"{name}_w_1")(h)
                h = h * nn.sigmoid(h)  # swish
                h = nn.Dropout(self.dropout)(h, deterministic=not train)
                h = nn.Dense(self.d_model, name=f"{name}_w_2")(h)
            return nn.Dropout(self.dropout)(h, deterministic=not train)

        if self.macaron:
            x = x + 0.5 * ff("ff_macaron", x)

        h = nn.LayerNorm(epsilon=LN_EPS, name="norm_mha")(x)
        h = RelPositionMultiHeadedAttention(
            self.d_model, self.num_heads, self.attn_dropout,
            legacy=self.legacy,
            attn_implementation=self.attn_implementation, name="self_attn",
        )(h, pos_emb, valid_mask, train=train)
        x = x + nn.Dropout(self.dropout)(h, deterministic=not train)

        h = nn.LayerNorm(epsilon=LN_EPS, name="norm_conv")(x)
        h = EspnetConvModule(self.d_model, self.kernel_size, name="conv_module")(
            h, train=train
        )
        x = x + nn.Dropout(self.dropout)(h, deterministic=not train)

        x = x + (0.5 if self.macaron else 1.0) * ff("ff", x)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm_final")(x)


def _layer_cls(remat: bool):
    """Optionally wrap EspnetConformerLayer in per-layer gradient remat
    (same rationale as `nn/conformer.py:_block_cls`). `train` is arg 4
    counting the module instance as arg 0."""
    if remat:
        return nn.remat(EspnetConformerLayer, static_argnums=(4,))
    return EspnetConformerLayer


class EspnetConformerEncoder(nn.Module):
    """Drop-in alternative to EspnetTransformerEncoder for JETS."""

    d_model: int
    num_heads: int
    linear_units: int
    num_blocks: int
    n_symbols: Optional[int] = None
    kernel_size: int = 7
    dropout: float = 0.1
    positional_dropout: float = 0.1
    attn_dropout: float = 0.1
    macaron: bool = True
    ffn_type: str = "conv1d"
    ffn_kernel: int = 1
    legacy: bool = False  # espnet conformer_rel_pos_type == "legacy"
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
            emb = emb * (xs != 0)[..., None]
            x = emb
        else:
            x = xs
        T = x.shape[1]
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))
        x = nn.Dropout(self.positional_dropout)(x, deterministic=not train)
        if self.legacy:
            from viet_tts_tpu.nn.espnet_transformer import (
                interleaved_sinusoid_table,
            )

            pos_emb = jnp.asarray(interleaved_sinusoid_table(T, self.d_model))[
                None
            ]
        else:
            pos_emb = jnp.asarray(rel_positional_table(T, self.d_model))[None]
        if self.attn_implementation == "shift":
            pos_emb = nn.Dropout(self.positional_dropout)(
                pos_emb, deterministic=not train
            )
        # factorized/flash paths consume the raw sinusoid table (the
        # rotation identity in ops/espnet_attention.py requires it), so the
        # espnet pos-table dropout is skipped there — a deliberate,
        # documented training-regularization divergence; eval graphs are
        # identical either way.

        layer_cls = _layer_cls(self.remat)
        for i in range(self.num_blocks):
            x = layer_cls(
                self.d_model,
                self.num_heads,
                self.linear_units,
                self.kernel_size,
                self.dropout,
                self.attn_dropout,
                self.macaron,
                self.ffn_type,
                self.ffn_kernel,
                self.legacy,
                self.attn_implementation,
                name=f"layer_{i}",
            )(x, pos_emb, valid_mask, train)
        x = nn.LayerNorm(epsilon=LN_EPS, name="after_norm")(x)
        return x, valid_mask
