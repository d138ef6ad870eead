"""Matcha-TTS tests: CFM training forward, Euler inference, trainer smoke."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viet_tts_tpu.models.matcha import MatchaTTS, MatchaTTSLoss, fix_len_compatibility

from tests.synth_data import build_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_HP = {
    "spk_dims": -1,
    "use_cvae": True,
    "vcae": {
        "conv_layers": 3,
        "conv_chans_list": [8, 8, 16],
        "conv_kernel_size": 3,
        "conv_stride": 2,
        "gru_layers": 1,
        "gru_units": 16,
    },
    "spk_emb_dim": 16,
    "text_encoder": {
        "hidden_dim": 32,
        "use_prenet": True,
        "prenet": {"kernel_size": 5, "n_layers": 2, "p_dropout": 0.5},
        "encoder": {
            "filter_channels": 64,
            "n_heads": 2,
            "n_layers": 2,
            "kernel_size": 3,
            "p_dropout": 0.1,
        },
    },
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
    "flow_matching": {"solver": "euler", "sigma_min": 1e-4},
    "decoder": {
        "channels": [32, 32],
        "dropout": 0.05,
        "attention_head_dim": 16,
        "n_blocks": 1,
        "num_mid_blocks": 1,
        "num_heads": 2,
        "act_fn": "snakebeta",
    },
}
STATS = {"mel_mean": -3.0, "mel_std": 2.5}


def make_batch(B=2, T_text=7, T_mel=32, n_mels=20, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        text=jnp.asarray(rng.randint(1, 131, (B, T_text))),
        text_lengths=jnp.asarray([T_text, T_text - 2]),
        feats=jnp.asarray(rng.randn(B, T_mel, n_mels).astype(np.float32)),
        feats_lengths=jnp.asarray([T_mel, T_mel - 8]),
        sids=jnp.asarray([0, 1]),
        aids=jnp.asarray([0, 1]),
        duration=jnp.asarray(rng.rand(B, T_mel, T_text).astype(np.float32)),
    )


@pytest.fixture(scope="module")
def matcha():
    model = MatchaTTS(
        n_symbols=131, n_channels=20, hparams=TINY_HP, stats=STATS, n_speakers=2
    )
    batch = make_batch()
    key = jax.random.PRNGKey(0)
    rngs = {"params": key, "dropout": key, "reparam": key, "noise": key}
    variables = model.init(rngs, **batch, step=0, train=True)
    return model, variables, batch


def test_fix_len_compatibility():
    assert fix_len_compatibility(30) == 32
    assert fix_len_compatibility(32) == 32


def test_training_forward(matcha):
    model, variables, batch = matcha
    key = jax.random.PRNGKey(1)
    preds, _ = model.apply(
        variables,
        **batch,
        step=jnp.asarray(100),
        train=True,
        rngs={"dropout": key, "reparam": key, "noise": key},
        mutable=["batch_stats"],
    )
    dec_outs, u, mu_y, txt_pad, mel_valid, feats_lens, durs, log_d, attn_out, probs = preds
    assert dec_outs.shape == (2, 32, 20) == u.shape == mu_y.shape
    assert np.isfinite(np.asarray(dec_outs)).all()
    durs = np.asarray(durs)
    assert durs[0].sum() == 32 and durs[1].sum() == 24


def test_loss_and_grads(matcha):
    model, variables, batch = matcha
    key = jax.random.PRNGKey(2)
    crit = MatchaTTSLoss(
        {
            "n_channels": 20,
            "linbuild": {"start": 1e-4, "stop": 5e-4, "n_up": 10, "n_stop": 35},
            "binarization_loss_warmup_steps": 10,
            "binarization_loss_enable_steps": 18,
        }
    )

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            **batch,
            step=jnp.asarray(100),
            train=True,
            rngs={"dropout": key, "reparam": key, "noise": key},
            mutable=["batch_stats"],
        )
        losses = crit(preds, (batch["feats"], batch["text_lengths"]), step=jnp.asarray(100))
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    assert set(losses) == {"diff", "prior", "cvae", "ctc", "bin", "dur"}
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_euler_inference(matcha):
    model, variables, batch = matcha

    @jax.jit
    def synth(variables, sids, text, lens, feats, aids):
        return model.apply(
            variables,
            sids,
            text,
            lens,
            64,
            feats=feats,
            aids=aids,
            n_timesteps=4,
            method=model.inference,
            rngs={"noise": jax.random.PRNGKey(0)},
        )

    mel, mel_lens, _ = synth(
        variables,
        batch["sids"],
        batch["text"],
        batch["text_lengths"],
        batch["feats"],
        batch["aids"],
    )
    assert mel.shape == (2, 64, 20)
    assert np.isfinite(np.asarray(mel)).all()


def test_matcha_trainer_smoke(tmp_path):
    from viet_tts_tpu.config import build_config
    from viet_tts_tpu.train.matcha import MatchaTrainer

    data_dir, egs_dir = build_dataset(str(tmp_path), n_utts=4)
    conf = build_config(os.path.join(REPO, "config"))
    conf["train"]["batch_size"] = 2
    hp = dict(TINY_HP)
    conf["models"]["matcha"] = hp
    args = argparse.Namespace(
        task="matcha",
        input_folder=egs_dir,
        data_folder=data_dir,
        output_folder=os.path.join(str(tmp_path), "out"),
        checkpoint=None,
        acoustic_checkpoint=None,
        vocoder_checkpoint=None,
        version="matcha",
        max_iter=2,
        is_finetune=False,
    )
    trainer = MatchaTrainer(args, conf)
    trainer.run()
    out = args.output_folder
    assert any(f.startswith("generator") for f in os.listdir(out))
    import json

    stats = json.load(open(os.path.join(out, "stats.json")))
    assert "mel_mean" in stats and "mel_std" in stats


def test_unet_conformer_blocks():
    from viet_tts_tpu.models.matcha.decoder import UNetDecoder

    dec = UNetDecoder(
        out_channels=8,
        channels=(16, 16),
        attention_head_dim=8,
        num_heads=2,
        down_block_type="conformer",
        mid_block_type="conformer",
        up_block_type="conformer",
    )
    x = jnp.zeros((2, 32, 8))
    mask = jnp.ones((2, 32, 1))
    mu = jnp.zeros((2, 32, 8))
    t = jnp.asarray([0.1, 0.9])
    variables = dec.init(jax.random.PRNGKey(0), x, mask, mu, t)
    out = dec.apply(variables, x, mask, mu, t)
    assert out.shape == (2, 32, 8)
    assert np.isfinite(np.asarray(out)).all()
    # conformer params present
    flat = jax.tree_util.tree_leaves_with_path(variables)
    assert any("rel_pos_emb" in jax.tree_util.keystr(p) for p, _ in flat)
