"""HiFi-GAN tests: generator geometry, discriminators, GAN step, trainer."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viet_tts_tpu.models.hifigan import (
    HiFiGANGenerator,
    MelSpectrogramLoss,
    MultiScaleMultiPeriodDiscriminator,
    discriminator_adversarial_loss,
    feature_match_loss,
    generator_adversarial_loss,
)

from tests.synth_data import build_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_gen():
    gen = HiFiGANGenerator(channels=32)
    mel = jnp.zeros((2, 16, 80))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    return gen, variables


def test_generator_upsample_geometry(tiny_gen):
    gen, variables = tiny_gen
    for t in (16, 32, 50):
        wav = gen.apply(variables, jnp.zeros((2, t, 80)))
        assert wav.shape == (2, t * 256, 1)
        assert (np.abs(np.asarray(wav)) <= 1).all()  # tanh range


def test_grouped_mrf_matches_layer_path():
    """grouped_mrf folds each tail stage's 3 resblock branches into one
    block-diagonal wide-kernel conv chain (generator.py:_grouped_stage).
    Zero taps + block-diag zeros make it numerically exact vs the plain
    layer path — the probe for the two-stage fused graph where the packed
    tail regresses (PERF_NOTES §1, VERDICT r4 item 8)."""
    gen = HiFiGANGenerator(channels=64)  # tail stages ch = 32,16,8,4 < 128
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 80))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    want = gen.apply(variables, mel)
    got = HiFiGANGenerator(channels=64, grouped_mrf=True).apply(
        variables, mel
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_generator_global_conditioning():
    gen = HiFiGANGenerator(channels=32, global_channels=192)
    mel = jnp.zeros((2, 16, 80))
    g = jnp.ones((2, 192))
    variables = gen.init(jax.random.PRNGKey(0), mel, g)
    out_g = gen.apply(variables, mel, g)
    out_none = gen.apply(variables, mel, jnp.zeros((2, 192)))
    assert not np.allclose(np.asarray(out_g), np.asarray(out_none))


def test_discriminator_structure():
    disc = MultiScaleMultiPeriodDiscriminator()
    wav = jnp.zeros((2, 4096, 1))
    variables = disc.init(jax.random.PRNGKey(0), wav)
    outs = disc.apply(variables, wav)
    assert len(outs) == 6  # 1 scale + 5 periods
    assert len(outs[0]) == 8  # scale: first + 5 downsample + pre-out + out
    for o in outs[1:]:
        assert len(o) == 6  # period: 5 convs + flattened logits


def test_gan_losses_perfect_disc():
    """With outputs exactly 1 (real) / 0 (fake), adversarial losses are 0."""
    ones = [[jnp.ones((2, 7))]]
    zeros = [[jnp.zeros((2, 7))]]
    assert float(generator_adversarial_loss(ones)) == 0.0
    real, fake = discriminator_adversarial_loss(zeros, ones)
    assert float(real) == 0.0 and float(fake) == 0.0
    assert float(feature_match_loss(ones, ones)) == 0.0


def test_mel_loss_zero_for_identical():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4096).astype(np.float32))
    assert float(MelSpectrogramLoss()(x, x)) == 0.0
    assert float(MelSpectrogramLoss()(x, 0.5 * x)) > 0.0


def test_gan_train_step_decreases_disc_loss():
    from viet_tts_tpu.train.gan import make_hifigan_train_step
    from viet_tts_tpu.train.state import TrainState, adamw_with_clip

    gen = HiFiGANGenerator(channels=16)
    disc = MultiScaleMultiPeriodDiscriminator(
        scale_params={"channels": 16, "max_downsample_channels": 64},
        period_params={"channels": 4, "max_downsample_channels": 32},
    )
    rng = np.random.RandomState(0)
    mel = rng.randn(2, 16, 80).astype(np.float32)
    speech = rng.randn(2, 4096, 1).astype(np.float32) * 0.1
    batch = {"mel": jnp.asarray(mel), "speech": jnp.asarray(speech)}

    key = jax.random.PRNGKey(0)
    gv = gen.init(key, batch["mel"])
    dv = disc.init(key, batch["speech"])
    gen_state = TrainState.create(
        apply_fn=gen.apply, params=gv["params"], tx=adamw_with_clip(2e-4)
    )
    disc_state = TrainState.create(
        apply_fn=disc.apply, params=dv["params"], tx=adamw_with_clip(2e-4)
    )
    step = jax.jit(make_hifigan_train_step(gen, disc, MelSpectrogramLoss()))

    first = None
    for _ in range(5):
        gen_state, disc_state, metrics = step(gen_state, disc_state, batch)
        if first is None:
            first = float(metrics["disc"])
    assert np.isfinite(float(metrics["gen"]))
    assert float(metrics["disc"]) < first  # discriminator is learning


def test_hifigan_trainer_smoke(tmp_path):
    from viet_tts_tpu.config import build_config
    from viet_tts_tpu.train.gan import HiFiGANTrainer

    data_dir, egs_dir = build_dataset(str(tmp_path), n_utts=4)
    conf = build_config(os.path.join(REPO, "config"))
    conf["train"]["batch_size"] = 2
    conf["models"]["hifigan"]["segment_size"] = 16
    conf["models"]["hifigan"]["upsample_initial_channel"] = 16
    conf["models"]["hifigan"]["discriminator_params"] = {
        "scales": 1,
        "periods": [2, 3],
        "scale_discriminator_params": {
            "channels": 8,
            "max_downsample_channels": 16,
        },
        "period_discriminator_params": {
            "channels": 4,
            "max_downsample_channels": 8,
        },
    }

    args = argparse.Namespace(
        task="hifigan",
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
    trainer = HiFiGANTrainer(args, conf)
    trainer.run()
    out = args.output_folder
    assert any(f.startswith("generator") for f in os.listdir(out))
    assert os.path.exists(
        os.path.join(out, "last_discriminator_statedict.msgpack")
    )
