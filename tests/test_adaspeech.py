"""AdaSpeech tests: CLN blocks, acoustic conditions, distillation switch."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viet_tts_tpu.models.adaspeech import AdaSpeech, AdaSpeechLoss, ConditionalLayerNorm

from tests.synth_data import build_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_hp(phoneme_step=5):
    return {
        "max_seq_len": 100,
        "encoder_layers": 1,
        "encoder_hidden": 32,
        "decoder_layers": 1,
        "decoder_hidden": 32,
        "use_cvae": True,
        "use_postnet": True,
        "building_block": {
            "block_type": "transformer",
            "transformer": {
                "encoder_head": 2,
                "decoder_head": 2,
                "conv_filter_size": 64,
                "conv_kernel_size": [9, 1],
                "encoder_dropout": 0.2,
                "decoder_dropout": 0.2,
            },
        },
        "vcae": {
            "conv_layers": 3,
            "conv_chans_list": [8, 8, 16],
            "conv_kernel_size": 3,
            "conv_stride": 2,
            "gru_layers": 1,
            "gru_units": 16,
        },
        "variance": {
            "learn_alignment": True,
            "duration_modelling": {
                "use_gaussian": True,
                "aligner_temperature": 0.0005,
                "binarization_start_steps": 4,
            },
            "variance_predictor": {
                "filter_size": 16,
                "kernel_size": 3,
                "dropout": 0.5,
                "dur_predictor_layers": 2,
                "dur_predictor_kernel": 3,
                "pit_predictor_layers": 2,
                "pit_predictor_kernel": 5,
                "ener_predictor_layers": 2,
                "ener_predictor_kernel": 5,
                "ffn_padding": "SAME",
                "ffn_act": "gelu",
            },
            "variance_embedding": {
                "n_bins": 16,
                "pitch_feature": "phoneme_level",
                "pitch_quantization": "linear",
                "energy_feature": "phoneme_level",
                "energy_quantization": "linear",
            },
            "reference_encoder": {
                "phoneme_level_encoder_step": phoneme_step,
                "phn_latent_dim": 4,
                "utterance_encoder": {
                    # n_chans must equal encoder_hidden (added directly)
                    "idim": 20, "n_layers": 2, "n_chans": 32, "kernel_size": 5,
                    "pool_kernel": 3, "dropout_rate": 0.5, "stride": 3,
                },
                "phoneme_level_encoder": {
                    "idim": 20, "n_layers": 2, "n_chans": 16, "kernel_size": 3,
                    "dropout_rate": 0.5, "stride": 1,
                },
                "phoneme_level_predictor": {
                    "idim": 32, "n_layers": 2, "n_chans": 16, "kernel_size": 3,
                    "dropout_rate": 0.5, "stride": 1,
                },
            },
        },
        "postnet": {"embedding_dim": 32, "conv_layers": 3, "kernel_size": 5},
    }


STATS = {"pitch": {"min": -2.0, "max": 8.0}, "energy": {"min": -2.0, "max": 8.0}}


def make_batch(B=2, T_text=7, T_mel=24, n_mels=20, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        text=jnp.asarray(rng.randint(1, 131, (B, T_text))),
        text_lengths=jnp.asarray([T_text, T_text - 2]),
        feats=jnp.asarray(rng.randn(B, T_mel, n_mels).astype(np.float32)),
        feats_lengths=jnp.asarray([T_mel, T_mel - 6]),
        duration=jnp.asarray(rng.rand(B, T_mel, T_text).astype(np.float32)),
        pitch=jnp.asarray(rng.randn(B, T_mel).astype(np.float32)),
        energy=jnp.asarray(rng.randn(B, T_mel).astype(np.float32)),
        sids=jnp.asarray([0, 1]),
        aids=jnp.asarray([0, 1]),
    )


def test_cln_starts_as_layernorm():
    cln = ConditionalLayerNorm(8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8).astype(np.float32))
    spk = jnp.asarray(np.random.RandomState(1).randn(2, 6).astype(np.float32))
    v = cln.init(jax.random.PRNGKey(0), x, spk)
    out = np.asarray(cln.apply(v, x, spk))
    # zero-init projections -> scale 1, bias 0 -> plain layer norm
    ref = (np.asarray(x) - np.asarray(x).mean(-1, keepdims=True)) / np.sqrt(
        np.asarray(x).var(-1, keepdims=True) + 1e-5
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ada():
    model = AdaSpeech(
        n_symbols=131, n_channels=20, hparams=tiny_hp(), stats=STATS, n_speakers=2
    )
    batch = make_batch()
    key = jax.random.PRNGKey(0)
    rngs = {"params": key, "dropout": key, "reparam": key}
    variables = model.init(rngs, **batch, step=0, train=True)
    return model, variables, batch


def test_forward_and_loss(ada):
    model, variables, batch = ada
    key = jax.random.PRNGKey(1)
    (y_pred, y_extra), _ = model.apply(
        variables,
        **batch,
        step=jnp.asarray(10),
        train=True,
        rngs={"dropout": key, "reparam": key},
        mutable=["batch_stats"],
    )
    assert y_pred[0].shape == (2, 24, 20)
    assert y_pred[-1].shape == (2, 7, 4)  # phn_pred
    assert y_extra[-1].shape == (2, 7, 4)  # phn_encode

    crit = AdaSpeechLoss(
        {
            "linbuild": {"start": 1e-4, "stop": 5e-4, "n_up": 10, "n_stop": 35},
            "dur_loss_lambda": {"pdur": 1.0, "wdur": 0.0, "sdur": 0.0},
            "binarization_loss_warmup_steps": 10,
            "binarization_loss_enable_steps": 18,
            "pitch_feature_level": "phoneme_level",
            "energy_feature_level": "phoneme_level",
            "phoneme_level_encoder_step": 5,
        }
    )
    targets = (batch["feats"], None, None, *y_extra)
    losses = crit(y_pred, targets, step=jnp.asarray(10))
    assert "avg_mel_phn" in losses
    assert np.isfinite(float(sum(losses.values())))
    # before the distillation step the avg_mel_phn term is zero-weighted
    losses_early = crit(y_pred, targets, step=jnp.asarray(0))
    assert float(losses_early["avg_mel_phn"]) == 0.0


def test_inference(ada):
    model, variables, batch = ada
    mel, mel_lens, _ = model.apply(
        variables,
        batch["sids"],
        batch["text"],
        batch["text_lengths"],
        48,
        feats=batch["feats"],
        aids=batch["aids"],
        method=model.inference,
    )
    assert mel.shape == (2, 48, 20)
    assert np.isfinite(np.asarray(mel)).all()


def test_adaspeech_trainer_smoke(tmp_path):
    from viet_tts_tpu.config import build_config
    from viet_tts_tpu.train.trainer import AdaSpeechTrainer

    data_dir, egs_dir = build_dataset(str(tmp_path), n_utts=4)
    conf = build_config(os.path.join(REPO, "config"))
    conf["train"]["batch_size"] = 2
    hp = tiny_hp()
    for enc_key in ("utterance_encoder", "phoneme_level_encoder"):
        hp["variance"]["reference_encoder"][enc_key]["idim"] = 80
    conf["models"]["adaspeech"] = hp
    args = argparse.Namespace(
        task="adaspeech",
        input_folder=egs_dir,
        data_folder=data_dir,
        output_folder=os.path.join(str(tmp_path), "out"),
        checkpoint=None,
        acoustic_checkpoint=None,
        vocoder_checkpoint=None,
        version="adaspeech",
        max_iter=2,
        is_finetune=False,
    )
    trainer = AdaSpeechTrainer(args, conf)
    trainer.run()
    assert any(
        f.startswith("generator") for f in os.listdir(args.output_folder)
    )
