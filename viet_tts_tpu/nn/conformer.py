"""Conformer blocks (macaron FFN + rel-pos MHSA + conv module) in flax.

Architecture parity with `models/tts/fastspeech2/blocks/conformer.py`:
half-step macaron feed-forwards, Transformer-XL relative attention with
learned u/v biases and the relative-shift trick (fed the absolute sinusoid
table, as the reference does), GLU + depthwise-conv module with BatchNorm,
final LayerNorm, padding zeroed at block end.
"""

from __future__ import annotations

import jax
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from viet_tts_tpu.nn.utils import sinusoid_position_table

MASK_NEG = -1.0e9


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(x)


class FeedForwardModule(nn.Module):
    """Pre-norm Linear(4x) + Swish + Linear, no residual (added by caller)."""

    d_model: int
    expansion: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.d_model * self.expansion)(x)
        x = swish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = nn.Dense(self.d_model)(x)
        return nn.Dropout(self.dropout)(x, deterministic=not train)


class RelativeMultiHeadAttention(nn.Module):
    """Transformer-XL attention with content (u) and position (v) biases.

    ``attn_implementation`` selects the score path (all mathematically
    identical; pinned against each other in `tests/test_xl_attention.py` /
    `tests/test_pallas_attention.py`):

    - "shift": the reference's padded-reshape relative shift
      (`blocks/conformer.py`) — materialises two extra (B, H, T, T)
      copies; kept as the parity default.
    - "dense": the factorized rewrite (`ops/xl_attention.py`) — three
      matmuls + iota-select, no shift copies; attention-weight dropout
      still applies (weights are materialised).
    - "flash": the fused Pallas kernel (`ops/pallas_attention.py`) — the
      (B, H, T, T) tensor never reaches HBM in either direction (fwd
      online softmax; bwd recomputes probability tiles in VMEM).
      Attention-weight dropout runs INSIDE the kernel from the on-core
      PRNG (mask regenerated in fwd and bwd from one per-call seed drawn
      off the module's "dropout" RNG stream), so training keeps flax
      nn.Dropout semantics without materialising weights.
    """

    d_model: int
    num_heads: int
    dropout: float = 0.1
    attn_implementation: str = "shift"

    @staticmethod
    def _relative_shift(pos_score: jnp.ndarray) -> jnp.ndarray:
        """The XL shift: prepend a zero column, fold, drop the first row."""
        b, h, t1, t2 = pos_score.shape
        padded = jnp.concatenate(
            [jnp.zeros((b, h, t1, 1), pos_score.dtype), pos_score], axis=-1
        )
        padded = padded.reshape(b, h, t2 + 1, t1)
        return padded[:, :, 1:].reshape(b, h, t1, t2)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos_emb: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        B, T, _ = x.shape
        H, D = self.num_heads, self.d_model // self.num_heads

        q = nn.Dense(self.d_model, name="query_proj")(x).reshape(B, T, H, D)
        k = nn.Dense(self.d_model, name="key_proj")(x).reshape(B, T, H, D)
        v = nn.Dense(self.d_model, name="value_proj")(x).reshape(B, T, H, D)
        pos_proj = nn.Dense(self.d_model, use_bias=False, name="pos_proj")

        u_bias = self.param(
            "u_bias", nn.initializers.xavier_uniform(), (H, D)
        )
        v_bias = self.param(
            "v_bias", nn.initializers.xavier_uniform(), (H, D)
        )
        # reference divides by sqrt(d_model), not sqrt(d_head)
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.d_model, x.dtype))

        impl = self.attn_implementation

        if impl != "shift":
            # static float: the Pallas kernel closes over scale at trace
            # time (a traced jnp scalar would ConcretizationTypeError)
            scale = 1.0 / math.sqrt(self.d_model)
            # factorized paths consume the raw sinusoid table (the rotation
            # identity in ops/xl_attention.py requires it; the encoders pass
            # exactly that, broadcast over batch) and the pos_proj kernel
            # pulled onto the query side. The identity feed both creates the
            # flax param and reads it back — E x E, negligible.
            from viet_tts_tpu.ops.xl_attention import (
                xl_attention_scores,
                xl_pos_queries,
            )

            table = pos_emb[0]
            pos_kernel = pos_proj(jnp.eye(table.shape[-1], dtype=x.dtype))
            if impl == "flash":
                from viet_tts_tpu.ops.pallas_attention import (
                    _XL2_MAX_T,
                    _XL3_MAX_T,
                    _padded_time,
                    _xl3_padded_time,
                    flash_xl2_attention,
                    flash_xl3_attention,
                    flash_xl_attention,
                )
                from viet_tts_tpu.ops.xl_attention import (
                    xl_pos_query_stream,
                )

                drop_p, seed = 0.0, None
                if train and self.dropout > 0.0:
                    drop_p = self.dropout
                    seed = jax.random.randint(
                        self.make_rng("dropout"), (1,), 0,
                        jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                    )
                if _xl3_padded_time(T) <= _XL3_MAX_T:
                    # projected-table kernel: D-wide contraction, no
                    # position stream at all (pallas_attention.py §xl3)
                    p3 = (table @ pos_kernel).reshape(T, H, D)
                    ctx = flash_xl3_attention(
                        q + u_bias, k, v, q + v_bias, p3, scale,
                        pad_mask=pad_mask, dropout_p=drop_p,
                        dropout_seed=seed,
                    )
                elif _padded_time(T) <= _XL2_MAX_T:
                    # single-stream kernel: the rotated (B,T,H,E) copies
                    # never reach HBM (ops/pallas_attention.py xl2 note)
                    g = xl_pos_query_stream(q + v_bias, pos_kernel)
                    ctx = flash_xl2_attention(
                        q + u_bias, k, v, g, table, scale,
                        pad_mask=pad_mask, dropout_p=drop_p,
                        dropout_seed=seed,
                    )
                else:
                    gA, gB = xl_pos_queries(q + v_bias, pos_kernel)
                    ctx = flash_xl_attention(
                        q + u_bias, k, v, gA, gB, table, scale,
                        pad_mask=pad_mask, dropout_p=drop_p,
                        dropout_seed=seed,
                    )
                return nn.Dense(self.d_model, name="out_proj")(ctx)
            gA, gB = xl_pos_queries(q + v_bias, pos_kernel)
            score = xl_attention_scores(
                q + u_bias, k, gA, gB, table, scale
            )
        else:
            p = pos_proj(pos_emb).reshape(B, -1, H, D)
            content = jnp.einsum("bqhd,bkhd->bhqk", q + u_bias, k)
            pos = jnp.einsum("bqhd,bkhd->bhqk", q + v_bias, p)
            pos = self._relative_shift(pos)
            score = (content + pos) * scale

        if pad_mask is not None:
            score = jnp.where(pad_mask[:, None, None, :], MASK_NEG, score)
        attn = nn.softmax(score, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=not train)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(ctx)


class ConformerConvModule(nn.Module):
    """LN -> pointwise(2x) -> GLU -> depthwise -> BN -> Swish -> pointwise."""

    d_model: int
    kernel_size: int = 31
    expansion: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.LayerNorm()(x)
        x = nn.Conv(self.d_model * self.expansion, (1,), name="pw_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)  # GLU
        x = nn.Conv(
            self.d_model,
            (self.kernel_size,),
            padding="SAME",
            feature_group_count=self.d_model,
            use_bias=False,
            name="dw_conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        x = swish(x)
        x = nn.Conv(self.d_model, (1,), name="pw_conv2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=not train)


class ConformerBlock(nn.Module):
    """Macaron conformer block.

    NOTE ``mask_attn_keys``: the reference block
    (`blocks/conformer.py:252-257`) runs its sub-modules through an
    ``nn.Sequential`` which silently DROPS the mask, so its self-attention
    attends to padding keys and only the block output is zeroed. The default
    False mirrors that (required for imported-weight parity); True enables
    proper key masking for from-scratch training.
    """

    d_model: int
    num_heads: int = 8
    ffn_expansion: int = 4
    conv_expansion: int = 2
    kernel_size: int = 31
    half_step_residual: bool = True
    dropout: float = 0.1
    mask_attn_keys: bool = False
    attn_implementation: str = "shift"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos_emb: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        ff_factor = 0.5 if self.half_step_residual else 1.0

        x = x + ff_factor * FeedForwardModule(
            self.d_model, self.ffn_expansion, self.dropout, name="ff1"
        )(x, train=train)

        attn_in = nn.LayerNorm(name="mhsa_ln")(x)
        attn_out = RelativeMultiHeadAttention(
            self.d_model, self.num_heads, self.dropout,
            self.attn_implementation, name="mhsa"
        )(
            attn_in,
            pos_emb,
            pad_mask if self.mask_attn_keys else None,
            train=train,
        )
        x = x + nn.Dropout(self.dropout)(attn_out, deterministic=not train)

        x = x + ConformerConvModule(
            self.d_model,
            self.kernel_size,
            self.conv_expansion,
            self.dropout,
            name="conv",
        )(x, train=train)

        x = x + ff_factor * FeedForwardModule(
            self.d_model, self.ffn_expansion, self.dropout, name="ff2"
        )(x, train=train)

        x = nn.LayerNorm(name="final_ln")(x)
        if pad_mask is not None:
            x = x * (~pad_mask)[..., None]
        return x


def _block_cls(remat: bool):
    """Optionally wrap the block in per-layer gradient rematerialisation.

    Saves only each block's inputs on the forward pass and recomputes the
    block inside the backward sweep. The FS2 train step is HBM-bound by the
    fp32 (B, h, T, T) attention-score tensors autodiff otherwise stores
    (PERF_NOTES.md §2), so trading recompute FLOPs for those bytes is the
    right direction on TPU. `train` (arg 4; the module instance is arg 0)
    is static so `deterministic=not train` stays a Python bool under the
    checkpoint trace. Gradients are bit-identical either way.
    """
    if remat:
        return nn.remat(ConformerBlock, static_argnums=(4,))
    return ConformerBlock


class ConformerEncoder(nn.Module):
    """Phoneme embedding + absolute positions added + conformer stack.

    Returns (hidden, raw_embedding) (`blocks/conformer.py:14-91`).
    """

    n_symbols: int
    n_layers: int
    d_model: int
    max_seq_len: int
    num_heads: int = 8
    ffn_expansion: int = 4
    conv_expansion: int = 2
    kernel_size: int = 31
    half_step_residual: bool = True
    dropout: float = 0.1
    mask_attn_keys: bool = False
    attn_implementation: str = "shift"
    remat: bool = False

    @nn.compact
    def __call__(
        self, src_seq: jnp.ndarray, pad_mask: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        emb = nn.Embed(self.n_symbols + 1, self.d_model, name="src_word_emb")(src_seq)
        emb = emb * (src_seq != 0)[..., None]
        T = src_seq.shape[1]
        table = jnp.asarray(
            sinusoid_position_table(max(self.max_seq_len + 1, T), self.d_model)
        )[:T]
        x = emb + table[None]
        pos_emb = jnp.broadcast_to(table[None], (x.shape[0], T, self.d_model))
        block_cls = _block_cls(self.remat)
        for i in range(self.n_layers):
            x = block_cls(
                self.d_model,
                self.num_heads,
                self.ffn_expansion,
                self.conv_expansion,
                self.kernel_size,
                self.half_step_residual,
                self.dropout,
                self.mask_attn_keys,
                self.attn_implementation,
                name=f"layer_{i}",
            )(x, pos_emb, pad_mask, train)
        return x, emb


class ConformerDecoder(nn.Module):
    """Absolute positions added + conformer stack over frame features."""

    n_layers: int
    d_model: int
    max_seq_len: int
    num_heads: int = 8
    ffn_expansion: int = 4
    conv_expansion: int = 2
    kernel_size: int = 31
    half_step_residual: bool = True
    dropout: float = 0.1
    mask_attn_keys: bool = False
    attn_implementation: str = "shift"
    remat: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pad_mask: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        T = x.shape[1]
        table = jnp.asarray(
            sinusoid_position_table(max(self.max_seq_len + 1, T), self.d_model)
        )[:T]
        x = x + table[None]
        pos_emb = jnp.broadcast_to(table[None], (x.shape[0], T, self.d_model))
        block_cls = _block_cls(self.remat)
        for i in range(self.n_layers):
            x = block_cls(
                self.d_model,
                self.num_heads,
                self.ffn_expansion,
                self.conv_expansion,
                self.kernel_size,
                self.half_step_residual,
                self.dropout,
                self.mask_attn_keys,
                self.attn_implementation,
                name=f"layer_{i}",
            )(x, pos_emb, pad_mask, train)
        return x, pad_mask
