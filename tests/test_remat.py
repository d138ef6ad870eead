"""Stack-level remat identity tests for the families not covered by the
model-level tests (FS2: tests/test_fastspeech2.py, JETS: tests/test_jets.py).

hparams["remat"] / decoder_params["remat"] must not change the param tree
and must reproduce gradients up to float32 rounding — remat only trades
backward-pass memory for recompute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _grad_compare(make_module, make_inputs, loss_of_out):
    key = jax.random.PRNGKey(0)
    inputs = make_inputs()

    def grads_for(remat):
        m = make_module(remat)
        v = m.init({"params": key, "dropout": key}, *inputs, False)

        def loss_fn(params):
            out = m.apply({"params": params}, *inputs, True,
                          rngs={"dropout": key})
            return loss_of_out(out)

        return jax.value_and_grad(loss_fn)(v["params"])

    loss0, g0 = grads_for(False)
    loss1, g1 = grads_for(True)
    assert float(loss0) == pytest.approx(float(loss1), rel=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {tuple(p): g for p, g in jax.tree_util.tree_leaves_with_path(g1)}
    assert len(flat0) == len(flat1)
    for path, g in flat0:
        a, b = np.asarray(g), np.asarray(flat1[tuple(path)])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-4 * scale + 1e-7, (
            jax.tree_util.keystr(path)
        )


def test_cln_encoder_remat_grads_match():
    from viet_tts_tpu.models.adaspeech.layers import CLNTransformerEncoder

    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 50, (2, 9)).astype(np.int32))
    pad = jnp.zeros((2, 9), bool).at[1, 6:].set(True)
    spk = jnp.asarray(rng.randn(2, 16).astype(np.float32))

    _grad_compare(
        lambda remat: CLNTransformerEncoder(
            n_symbols=50, n_layers=2, d_model=16, max_seq_len=32,
            num_heads=2, d_inner=32, remat=remat,
        ),
        lambda: (text, pad, spk),
        lambda out: jnp.mean(out[0] ** 2),
    )


@pytest.mark.parametrize("block_type", ["transformer", "conformer"])
def test_matcha_unet_remat_grads_match(block_type):
    from viet_tts_tpu.models.matcha.decoder import UNetDecoder

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    mask = jnp.ones((2, 16, 1), jnp.float32)
    mu = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    t = jnp.asarray([0.3, 0.7], jnp.float32)

    def make(remat):
        return UNetDecoder(
            out_channels=8, channels=(16, 16), attention_head_dim=8,
            num_heads=2, down_block_type=block_type,
            mid_block_type=block_type, up_block_type=block_type,
            remat=remat,
        )

    key = jax.random.PRNGKey(0)

    def grads_for(remat):
        m = make(remat)
        v = m.init({"params": key, "dropout": key}, x, mask, mu, t, None, False)

        def loss_fn(params):
            out = m.apply({"params": params}, x, mask, mu, t, None, True,
                          rngs={"dropout": key})
            return jnp.mean(out**2)

        return jax.value_and_grad(loss_fn)(v["params"])

    loss0, g0 = grads_for(False)
    loss1, g1 = grads_for(True)
    assert float(loss0) == pytest.approx(float(loss1), rel=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {tuple(p): g for p, g in jax.tree_util.tree_leaves_with_path(g1)}
    assert len(flat0) == len(flat1)
    for path, g in flat0:
        a, b = np.asarray(g), np.asarray(flat1[tuple(path)])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-4 * scale + 1e-7, (
            jax.tree_util.keystr(path)
        )


def test_vits_encoder_remat_grads_match():
    """hparams["remat"] on the VITS2 text-encoder stack: same param tree,
    gradients to fp32 rounding (closes the VitsEncoder exclusion noted in
    PARITY round-3; the lifted nn.remat keeps the inlined attn_i/ffn_i
    parameter names)."""
    from viet_tts_tpu.models.vits2.attentions import VitsEncoder

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 16).astype(np.float32))
    x_mask = jnp.ones((2, 9, 1), jnp.float32).at[1, 6:].set(0.0)
    g = jnp.asarray(rng.randn(2, 8).astype(np.float32))

    _grad_compare(
        lambda remat: VitsEncoder(
            hidden_channels=16, filter_channels=32, n_heads=2, n_layers=3,
            gin_channels=8, remat=remat,
        ),
        lambda: (x, x_mask, g),
        lambda out: jnp.mean(out ** 2),
    )
