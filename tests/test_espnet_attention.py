"""Factorized espnet rel-pos attention == the padded-reshift oracles.

Pins (a) the 'latest' shift's index map (reads the symmetric table at
relative position i - j), (b) factorized-logit equality for latest and
legacy flavours, (c) flash-kernel equality for all three espnet attention
forms, (d) module-level equivalence for both espnet encoders under
``attn_implementation`` = dense / flash.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from viet_tts_tpu.nn.espnet_conformer import (
    _legacy_rel_shift,
    _rel_shift,
    rel_positional_table,
)
from viet_tts_tpu.nn.espnet_transformer import interleaved_sinusoid_table
from viet_tts_tpu.ops.espnet_attention import (
    espnet_rel_scores_latest,
    neg_rel_table,
    rel_pos_queries_latest,
)
from viet_tts_tpu.ops.xl_attention import xl_attention_scores, xl_pos_queries

B, T, H, D, E = 2, 48, 4, 16, 64


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_latest_shift_index_map():
    """espnet _rel_shift == reading the (2T-1) table at c = T-1 - (i-j),
    i.e. relative position i - j."""
    s = np.asarray(_rand(0, 1, 1, T, 2 * T - 1))
    shifted = np.asarray(_rel_shift(jnp.asarray(s)))[0, 0]
    want = np.zeros((T, T), np.float32)
    for i in range(T):
        for j in range(T):
            want[i, j] = s[0, 0, i, T - 1 - i + j]
    np.testing.assert_array_equal(shifted, want)


def _latest_oracle(qc, k, q_v, pos_kernel, sym_table, scale):
    """The module's padded-reshape path (mirrors
    `nn/espnet_conformer.py:RelPositionMultiHeadedAttention`)."""
    p = (sym_table @ pos_kernel).reshape(1, -1, H, D)
    content = jnp.einsum("bqhd,bkhd->bhqk", qc, k)
    pos = jnp.einsum(
        "bqhd,bkhd->bhqk", q_v, jnp.broadcast_to(p, (B, p.shape[1], H, D))
    )
    pos = _rel_shift(pos)
    return (content + pos) * scale


def test_factorized_latest_matches_shift_path():
    sym = jnp.asarray(rel_positional_table(T, E))
    q = _rand(1, B, T, H, D)
    k = _rand(2, B, T, H, D)
    u = 0.1 * _rand(3, H, D)
    w = 0.1 * _rand(4, H, D)
    pk = _rand(5, E, H * D) / np.sqrt(E)
    scale = 1.0 / np.sqrt(D)

    g = rel_pos_queries_latest(q + w, pk)
    got = espnet_rel_scores_latest(q + u, k, g, neg_rel_table(sym), scale)
    want = _latest_oracle(q + u, k, q + w, pk, sym, scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_factorized_legacy_matches_shift_path():
    """Legacy == the FS2 XL factorization fed the interleaved table."""
    table = jnp.asarray(interleaved_sinusoid_table(T, E))
    q = _rand(6, B, T, H, D)
    k = _rand(7, B, T, H, D)
    u = 0.1 * _rand(8, H, D)
    w = 0.1 * _rand(9, H, D)
    pk = _rand(10, E, H * D) / np.sqrt(E)
    scale = 1.0 / np.sqrt(D)

    gA, gB = xl_pos_queries(q + w, pk)
    got = xl_attention_scores(q + u, k, gA, gB, table, scale)

    p = (table @ pk).reshape(1, T, H, D)
    content = jnp.einsum("bqhd,bkhd->bhqk", q + u, k)
    pos = jnp.einsum(
        "bqhd,bkhd->bhqk", q + w, jnp.broadcast_to(p, (B, T, H, D))
    )
    want = (content + _legacy_rel_shift(pos)) * scale
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_flash_rel_matches_dense():
    from viet_tts_tpu.ops.pallas_attention import flash_rel_attention

    sym = jnp.asarray(rel_positional_table(T, E))
    q = _rand(11, B, T, H, D)
    k = _rand(12, B, T, H, D)
    v = _rand(13, B, T, H, D)
    u = 0.1 * _rand(14, H, D)
    w = 0.1 * _rand(15, H, D)
    pk = _rand(16, E, H * D) / np.sqrt(E)
    scale = 1.0 / np.sqrt(D)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 9])[:, None]

    g = rel_pos_queries_latest(q + w, pk)
    neg = neg_rel_table(sym)
    scores = espnet_rel_scores_latest(q + u, k, g, neg, scale)
    scores = jnp.where(pad[:, None, None, :], -1.0e9, scores)
    want = jnp.einsum(
        "bhqk,bkhd->bqhd", jax.nn.softmax(scores, -1), v
    ).reshape(B, T, H * D)

    with pltpu.force_tpu_interpret_mode():
        got = flash_rel_attention(
            q + u, k, v, g, neg, scale, pad_mask=pad
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_flash_plain_matches_dense():
    from viet_tts_tpu.ops.pallas_attention import flash_attention

    q = _rand(17, B, T, H, D)
    k = _rand(18, B, T, H, D)
    v = _rand(19, B, T, H, D)
    scale = 1.0 / np.sqrt(D)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 5])[:, None]

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    scores = jnp.where(pad[:, None, None, :], -1.0e9, scores)
    want = jnp.einsum(
        "bhqk,bkhd->bqhd", jax.nn.softmax(scores, -1), v
    ).reshape(B, T, H * D)

    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, scale, pad_mask=pad)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("legacy", [False, True])
@pytest.mark.parametrize("impl", ["dense", "flash"])
def test_espnet_conformer_encoder_impl_equivalence(legacy, impl):
    from viet_tts_tpu.nn.espnet_conformer import EspnetConformerEncoder

    Tt = 32
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, Tt), 1, 40)
    valid = jnp.arange(Tt)[None, :] < jnp.asarray([Tt, Tt - 7])[:, None]

    def make(implementation):
        return EspnetConformerEncoder(
            d_model=64, num_heads=4, linear_units=96, num_blocks=2,
            n_symbols=40, legacy=legacy,
            attn_implementation=implementation,
        )

    ref = make("shift")
    params = ref.init(jax.random.PRNGKey(1), ids, valid)
    want, _ = ref.apply(params, ids, valid)
    with pltpu.force_tpu_interpret_mode():
        got, _ = make(impl).apply(params, ids, valid)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4
    )


def test_espnet_transformer_encoder_flash_equivalence():
    from viet_tts_tpu.nn.espnet_transformer import EspnetTransformerEncoder

    Tt = 32
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, Tt), 1, 40)
    valid = jnp.arange(Tt)[None, :] < jnp.asarray([Tt, Tt - 7])[:, None]

    def make(implementation):
        return EspnetTransformerEncoder(
            d_model=64, num_heads=4, linear_units=96, num_blocks=2,
            n_symbols=40, attn_implementation=implementation,
        )

    ref = make("shift")
    params = ref.init(jax.random.PRNGKey(1), ids, valid)
    want, _ = ref.apply(params, ids, valid)
    with pltpu.force_tpu_interpret_mode():
        got, _ = make("flash").apply(params, ids, valid)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4
    )


@pytest.mark.parametrize("enc_type", ["transformer", "conformer"])
def test_jets_attn_implementation_plumbs(enc_type):
    """`hparams["attn_implementation"]` reaches the JETS stacks: tiny JETS
    inference waveforms match between shift and dense implementations
    under one param tree."""
    from viet_tts_tpu.models.jets import JETS

    hp = dict(
        adim=32, aheads=2, elayers=1, dlayers=1, eunits=48, dunits=48,
        encoder_type=enc_type, decoder_type=enc_type,
        generator_channels=32,
        generator_upsample_scales=(4, 4),
        generator_upsample_kernel_sizes=(8, 8),
        generator_resblock_kernel_sizes=(3,),
        generator_resblock_dilations=((1, 3),),
    )
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 1, 40)
    lens = jnp.asarray([16, 11], jnp.int32)
    sid = jnp.zeros((2,), jnp.int32)
    key = jax.random.PRNGKey(1)
    rngs = {"params": key, "dropout": key, "noise": key}

    def build(impl):
        return JETS(
            n_symbols=40, n_channels=20, n_speakers=2,
            hparams={**hp, "attn_implementation": impl},
        )

    ref = build("shift")
    vars_ = ref.init(rngs, sid, ids, lens, 32, method=ref.inference)
    run = lambda m: m.apply(
        vars_, sid, ids, lens, 32, method=m.inference,
        rngs={"dropout": key, "noise": key},
    )[0]
    want = run(ref)
    got = run(build("dense"))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
