"""Factorized Transformer-XL attention == the padded-reshape shift path.

The rewrite (`ops/xl_attention.py`) replaces the XL relative-shift trick of
`nn/conformer.py:RelativeMultiHeadAttention` (parity target
`models/tts/fastspeech2/blocks/conformer.py`) with RoPE-style pre-rotated
query streams.  These tests pin (a) the shift's exact index map, (b) the
sinusoid rotation identity, (c) logits equality vs the oracle path, and
(d) full-module equality when the conformer block runs with
``attn_implementation="dense"/"flash"``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viet_tts_tpu.nn.utils import sinusoid_position_table
from viet_tts_tpu.ops.xl_attention import (
    rotate_pairs,
    xl_attention,
    xl_attention_reference,
    xl_attention_scores,
    xl_pos_queries,
)

B, T, H, D, E = 2, 48, 4, 16, 64


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_shift_index_map():
    """The padded-reshape trick == the documented (past / zero / future)
    index map, element by element."""
    s = np.asarray(_rand(0, T, T))
    padded = np.concatenate([np.zeros((T, 1), np.float32), s], axis=1)
    shifted = padded.reshape(T + 1, T)[1:].reshape(T, T)
    want = np.zeros_like(s)
    for i in range(T):
        for j in range(T):
            if j <= i:
                want[i, j] = s[i, T - 1 - (i - j)]
            elif j > i + 1:
                want[i, j] = s[i + 1, j - i - 2]
    np.testing.assert_array_equal(shifted, want)


def test_rotation_identity():
    """g_hat_i . t_j == g_i . t_{j + delta_i} on the sinusoid table."""
    table = jnp.asarray(sinusoid_position_table(3 * T, E))
    g = _rand(1, T, E)
    delta = jnp.asarray(np.arange(T) % 7 + 1, jnp.float32)
    g_hat = rotate_pairs(g, delta)
    lhs = g_hat @ table[:T].T                       # (T, T): g_hat_i . t_j
    idx = (np.arange(T)[None, :] + np.asarray(delta, np.int64)[:, None])
    rhs = np.einsum("ie,ije->ij", np.asarray(g), np.asarray(table)[idx])
    np.testing.assert_allclose(np.asarray(lhs), rhs, rtol=2e-4, atol=2e-4)


def test_factorized_logits_match_shift_path():
    table = jnp.asarray(sinusoid_position_table(T, E))
    q = _rand(2, B, T, H, D)
    k = _rand(3, B, T, H, D)
    u = 0.1 * _rand(4, H, D)
    v_b = 0.1 * _rand(5, H, D)
    pos_kernel = _rand(6, E, H * D) / np.sqrt(E)
    scale = 1.0 / np.sqrt(H * D)

    gA, gB = xl_pos_queries(q + v_b, pos_kernel)
    got = xl_attention_scores(q + u, k, gA, gB, table, scale)
    want = xl_attention_reference(q + u, k, q + v_b, pos_kernel, table, scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_xl_attention_dense_matches_module_math():
    """End-to-end context vectors match a hand-rolled shift-path attention
    (softmax + value contraction), with and without key padding."""
    table = jnp.asarray(sinusoid_position_table(T, E))
    q = _rand(7, B, T, H, D)
    k = _rand(8, B, T, H, D)
    v = _rand(9, B, T, H, D)
    u = 0.1 * _rand(10, H, D)
    v_b = 0.1 * _rand(11, H, D)
    pos_kernel = _rand(12, E, H * D) / np.sqrt(E)
    scale = 1.0 / np.sqrt(H * D)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 9])[:, None]

    for mask in (None, pad):
        want_scores = xl_attention_reference(
            q + u, k, q + v_b, pos_kernel, table, scale
        )
        if mask is not None:
            want_scores = jnp.where(
                mask[:, None, None, :], -1.0e9, want_scores
            )
        want = jnp.einsum(
            "bhqk,bkhd->bqhd", jax.nn.softmax(want_scores, -1), v
        ).reshape(B, T, H * D)
        got = xl_attention(
            q, k, v, u, v_b, pos_kernel, table, scale, pad_mask=mask
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )


def test_grads_flow_and_match():
    """d/d(q,k,v,u,v_bias,pos_kernel) of the factorized path == autodiff of
    the oracle path (same loss), to fp32 tolerance."""
    table = jnp.asarray(sinusoid_position_table(T, E))
    q = _rand(13, B, T, H, D)
    k = _rand(14, B, T, H, D)
    v = _rand(15, B, T, H, D)
    u = 0.1 * _rand(16, H, D)
    v_b = 0.1 * _rand(17, H, D)
    pos_kernel = _rand(18, E, H * D) / np.sqrt(E)
    scale = 1.0 / np.sqrt(H * D)
    w = _rand(19, B, T, H * D)  # fixed cotangent-ish probe

    def loss_fact(q, k, v, u, v_b, pk):
        out = xl_attention(q, k, v, u, v_b, pk, table, scale)
        return jnp.sum(out * w)

    def loss_ref(q, k, v, u, v_b, pk):
        scores = xl_attention_reference(q + u, k, q + v_b, pk, table, scale)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", jax.nn.softmax(scores, -1), v
        ).reshape(B, T, H * D)
        return jnp.sum(out * w)

    gf = jax.grad(loss_fact, argnums=(0, 1, 2, 3, 4, 5))(
        q, k, v, u, v_b, pos_kernel
    )
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        q, k, v, u, v_b, pos_kernel
    )
    for a, b, name in zip(gf, gr, "q k v u v_bias pos_kernel".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4, err_msg=name
        )
