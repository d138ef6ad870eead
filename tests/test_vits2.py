"""VITS2 tests: splines, model forward/inference, 3-optimizer trainer."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viet_tts_tpu.models.vits2 import (
    VITS2,
    DurationDiscriminator,
    MultiPeriodDiscriminator,
    discriminator_loss,
    generator_loss,
    kl_loss,
    unconstrained_rational_quadratic_spline,
)

from tests.synth_data import build_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_HP = {
    "segment_size": 2048,
    "inter_channels": 32,
    "hidden_channels": 32,
    "filter_channels": 64,
    "n_heads": 2,
    "n_layers": 3,
    "kernel_size": 3,
    "p_dropout": 0.1,
    "resblock": "1",
    "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3]],
    "upsample_rates": [8, 8, 2, 2],
    "upsample_initial_channel": 16,
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "gin_channels": 16,
    "use_sdp": True,
    "use_mel_posterior_encoder": True,
    "use_transformer_flows": True,
    "transformer_flow_type": "pre_conv",
    "use_spk_conditioned_encoder": False,
    "use_noise_scaled_mas": True,
    "use_duration_discriminator": True,
    "duration_discriminator_type": "dur_disc_1",
    "n_layers_q": 3,  # dead in the reference (generator hardcodes 16)
    "posterior_layers": 3,
    "n_flows": 1,
    "sdp_n_flows": 1,
    "flow_wn_layers": 2,
    "use_spectral_norm": False,
    "mpd_periods": [2],
}


def test_spline_invertibility():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 3).astype(np.float32) * 2)
    uw = jnp.asarray(rng.randn(2, 6, 3, 10).astype(np.float32) * 0.3)
    uh = jnp.asarray(rng.randn(2, 6, 3, 10).astype(np.float32) * 0.3)
    ud = jnp.asarray(rng.randn(2, 6, 3, 9).astype(np.float32) * 0.3)
    y, ld = unconstrained_rational_quadratic_spline(x, uw, uh, ud, tail_bound=5.0)
    x2, ld_inv = unconstrained_rational_quadratic_spline(
        y, uw, uh, ud, inverse=True, tail_bound=5.0
    )
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-4)
    # tails: out-of-range values pass through unchanged
    far = jnp.asarray([[[7.0, -9.0, 6.0]]])
    y_far, ld_far = unconstrained_rational_quadratic_spline(
        far, uw[:1, :1], uh[:1, :1], ud[:1, :1], tail_bound=5.0
    )
    np.testing.assert_array_equal(np.asarray(y_far), np.asarray(far))
    np.testing.assert_array_equal(np.asarray(ld_far), 0.0)


def make_batch(B=2, T_text=9, T_spec=40, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        text=jnp.asarray(rng.randint(1, 131, (B, T_text))),
        text_lengths=jnp.asarray([T_text, T_text - 2]),
        feats=jnp.asarray(rng.randn(B, T_spec, 80).astype(np.float32)),
        feats_lengths=jnp.asarray([T_spec, T_spec - 8]),
        sids=jnp.asarray([0, 1]),
    )


@pytest.fixture(scope="module")
def vits2():
    model = VITS2(n_symbols=131, hparams=TINY_HP, n_speakers=2, spec_channels=80)
    batch = make_batch()
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key, "noise": key, "segment": key},
        **batch,
        step=0,
        train=True,
    )
    return model, variables, batch


def test_forward_structure(vits2):
    model, variables, batch = vits2
    key = jax.random.PRNGKey(1)
    outs = model.apply(
        variables,
        **batch,
        step=jnp.asarray(5),
        train=True,
        rngs={"dropout": key, "noise": key, "segment": key},
    )
    o, l_length, attn, ids_slice, x_mask, y_mask, latents, durs = outs
    assert o.shape == (2, 2048, 1)
    assert attn.shape == (2, 9, 40)
    # MAS path covers every valid frame once
    assert float(np.asarray(attn).sum()) == 40 + 32
    assert all(t.shape == (2, 40, 32) for t in latents)
    hidden_x, logw, logw_ = durs
    assert logw.shape == logw_.shape == (2, 9, 1)
    assert np.isfinite(np.asarray(l_length)).all()


def test_inference(vits2):
    model, variables, batch = vits2

    @jax.jit
    def synth(variables, sids, text, lens):
        return model.apply(
            variables,
            sids,
            text,
            lens,
            64,
            method=model.inference,
            rngs={"noise": jax.random.PRNGKey(0)},
        )

    wav, wav_lens = synth(
        variables, batch["sids"], batch["text"], batch["text_lengths"]
    )
    assert wav.shape == (2, 64 * 256)
    assert np.isfinite(np.asarray(wav)).all()
    assert (np.asarray(wav_lens) % 256 == 0).all()


def test_losses():
    r = [jnp.ones((2, 5))]
    g = [jnp.zeros((2, 5))]
    loss, _, _ = discriminator_loss(r, g)
    assert float(loss) == 0.0
    gl, _ = generator_loss(r)
    assert float(gl) == 0.0
    # reference formula: kl = logs_p - logs_q - 0.5 + 0.5 (z-m)^2 e^{-2 logs_p}
    # with z_p = m_p and equal log-scales it evaluates to -0.5 per frame
    z = jnp.zeros((2, 4, 3))
    mask = jnp.ones((2, 4, 1))
    kl = kl_loss(z, jnp.zeros_like(z), jnp.zeros_like(z), jnp.zeros_like(z), mask)
    np.testing.assert_allclose(float(kl), -0.5 * 3, atol=1e-6)


def test_vits2_trainer_smoke(tmp_path):
    from viet_tts_tpu.config import build_config
    from viet_tts_tpu.train.vits2_trainer import VITS2Trainer

    data_dir, egs_dir = build_dataset(str(tmp_path), n_utts=4)
    conf = build_config(os.path.join(REPO, "config"))
    conf["train"]["batch_size"] = 2
    conf["models"]["vits2"] = dict(TINY_HP)
    args = argparse.Namespace(
        task="vits2",
        input_folder=egs_dir,
        data_folder=data_dir,
        output_folder=os.path.join(str(tmp_path), "out"),
        checkpoint=None,
        acoustic_checkpoint=None,
        vocoder_checkpoint=None,
        version="fastspeech2",
        max_iter=2,
        is_finetune=False,
    )
    trainer = VITS2Trainer(args, conf)
    trainer.run()
    out = args.output_folder
    assert any(f.startswith("generator") for f in os.listdir(out))
    assert os.path.exists(os.path.join(out, "last_discriminator_statedict.msgpack"))


@pytest.mark.parametrize(
    "ftype",
    [
        "pre_conv",
        "pre_conv2",
        "fft",
        "mono_layer_inter_residual",
        "mono_layer_post_residual",
        "none",
    ],
)
def test_flow_types_invertible(ftype):
    from viet_tts_tpu.models.vits2.layers import ResidualCouplingTransformersBlock

    block = ResidualCouplingTransformersBlock(
        channels=8,
        hidden_channels=16,
        kernel_size=5,
        dilation_rate=1,
        n_layers=2,
        n_flows=1,
        gin_channels=4,
        use_transformer_flows=ftype != "none",
        transformer_flow_type=ftype,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 8).astype(np.float32))
    mask = jnp.ones((2, 12, 1), jnp.float32)
    g = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x, mask, g=g, train=False)
    # the post convs are zero-init (identity coupling) -- randomize them so
    # invertibility is checked on a non-trivial transform
    variables = jax.tree_util.tree_map_with_path(
        lambda path, v: (
            jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.3)
            if any(getattr(p, "key", None) == "post" for p in path)
            else v
        ),
        variables,
    )
    z = block.apply(variables, x, mask, g=g, train=False)
    assert float(jnp.abs(z - x).max()) > 1e-3  # non-identity flow

    assert z.shape == x.shape and np.isfinite(np.asarray(z)).all()
    x_rec = block.apply(variables, z, mask, g=g, reverse=True, train=False)
    if ftype == "mono_layer_post_residual":
        # the reference reverse is not the exact inverse (sigmoid sign quirk,
        # reference layers.py:735-743); just require finite output
        assert np.isfinite(np.asarray(x_rec)).all()
    else:
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_unknown_flow_type_rejected():
    from viet_tts_tpu.models.vits2.layers import ResidualCouplingTransformersBlock

    block = ResidualCouplingTransformersBlock(
        channels=8, hidden_channels=16, use_transformer_flows=True,
        transformer_flow_type="garbagetype", n_flows=1,
    )
    with pytest.raises(ValueError, match="transformer_flow_type"):
        block.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8)),
            jnp.ones((1, 8, 1)),
            train=False,
        )


def test_posterior_layers_warning():
    """n_layers_q without posterior_layers warns (the reference hardcodes
    16 posterior layers; the key is dead there)."""
    import warnings

    from viet_tts_tpu.models.vits2.model import VITS2

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert VITS2._posterior_layers({"n_layers_q": 3}) == 16
        assert w and "n_layers_q" in str(w[0].message)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert VITS2._posterior_layers(
            {"n_layers_q": 3, "posterior_layers": 3}
        ) == 3
        assert not w
