"""Text2Wav joint model + trainer + finetuner tests."""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viet_tts_tpu.config import build_config
from viet_tts_tpu.models.text2wav import Text2Wav

from tests.synth_data import build_dataset, tiny_model_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_conf():
    conf = tiny_model_config(build_config(os.path.join(REPO, "config")))
    conf["train"]["batch_size"] = 2
    conf["models"]["hifigan"]["segment_size"] = 16
    conf["models"]["hifigan"]["upsample_initial_channel"] = 16
    conf["models"]["hifigan"]["discriminator_params"] = {
        "scales": 1,
        "periods": [2],
        "scale_discriminator_params": {"channels": 8, "max_downsample_channels": 16},
        "period_discriminator_params": {"channels": 4, "max_downsample_channels": 8},
    }
    return conf


STATS = {
    "pitch": {"min": -2.0, "max": 8.0, "mean": 0.0, "std": 1.0},
    "energy": {"min": -2.0, "max": 8.0, "mean": 0.0, "std": 1.0},
}


def make_batch(B=2, T_text=7, T_mel=32, n_mels=80, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        text=jnp.asarray(rng.randint(1, 131, (B, T_text))),
        text_lengths=jnp.asarray([T_text, T_text - 2]),
        feats=jnp.asarray(rng.randn(B, T_mel, n_mels).astype(np.float32)),
        feats_lengths=jnp.asarray([T_mel, T_mel - 8]),
        duration=jnp.asarray(rng.rand(B, T_mel, T_text).astype(np.float32)),
        pitch=jnp.asarray(rng.randn(B, T_mel).astype(np.float32)),
        energy=jnp.asarray(rng.randn(B, T_mel).astype(np.float32)),
        sids=jnp.asarray([0, 1]),
        aids=jnp.asarray([0, 1]),
    )


def test_text2wav_forward_and_inference():
    conf = tiny_conf()
    model = Text2Wav(
        n_symbols=131,
        n_channels=80,
        conf=conf,
        stats=STATS,
        n_speakers=2,
        version="fastspeech2",
    )
    batch = make_batch()
    key = jax.random.PRNGKey(0)
    rngs = {"params": key, "dropout": key, "reparam": key, "noise": key}
    variables = model.init(rngs, **batch, step=0, train=True)

    (outputs, y_extra, start_idxs), _ = model.apply(
        variables,
        **batch,
        step=jnp.asarray(10),
        train=True,
        rngs={"dropout": key, "reparam": key, "noise": key},
        mutable=["batch_stats"],
    )
    assert outputs[0].shape == (2, 16 * 256, 1)  # vocoded segments
    assert outputs[1].shape == (2, 16, 80)  # mel segments
    assert len(y_extra) == 3

    wav, wav_lens = model.apply(
        variables,
        batch["sids"],
        batch["text"],
        batch["text_lengths"],
        64,
        feats=batch["feats"],
        aids=batch["aids"],
        method=model.inference,
        rngs={"noise": key},
    )
    assert wav.shape == (2, 64 * 256)
    assert np.isfinite(np.asarray(wav)).all()


def _args(egs, data, out, max_iter=2, version="fastspeech2", **kw):
    return argparse.Namespace(
        task="text2wav",
        input_folder=egs,
        data_folder=data,
        output_folder=out,
        checkpoint=kw.get("checkpoint"),
        acoustic_checkpoint=kw.get("acoustic_checkpoint"),
        vocoder_checkpoint=kw.get("vocoder_checkpoint"),
        version=version,
        max_iter=max_iter,
        is_finetune=kw.get("is_finetune", False),
    )


@pytest.fixture(scope="module")
def joint_run(tmp_path_factory):
    from viet_tts_tpu.train.joint import JointTrainer

    root = str(tmp_path_factory.mktemp("joint"))
    data_dir, egs_dir = build_dataset(root, n_utts=4)
    conf = tiny_conf()
    out = os.path.join(root, "out")
    trainer = JointTrainer(_args(egs_dir, data_dir, out), conf)
    trainer.run()
    return root, data_dir, egs_dir, out, conf


def test_joint_trainer_smoke(joint_run):
    _, _, _, out, _ = joint_run
    assert any(f.startswith("generator") for f in os.listdir(out))
    assert os.path.exists(os.path.join(out, "last_discriminator_statedict.msgpack"))


def test_joint_finetuner_embedding_surgery(joint_run):
    from viet_tts_tpu.train.joint import JointFinetuner

    root, data_dir, egs_dir, out, conf = joint_run
    # new egs dir with an extra speaker
    ft_root = os.path.join(root, "ft")
    ft_data, ft_egs = build_dataset(
        ft_root, n_utts=3, speakers=("hn_spk", "hcm_spk", "hn_new")
    )
    from viet_tts_tpu.train.checkpoint import scan_checkpoint

    base_ckpt = scan_checkpoint(out, "generator")
    ft_out = os.path.join(ft_root, "out")
    trainer = JointFinetuner(
        _args(
            ft_egs,
            ft_data,
            ft_out,
            max_iter=1,
            checkpoint=base_ckpt,
            is_finetune=True,
        ),
        conf,
    )
    assert trainer.adapter_speakers == ["hn_new"]
    # surgery produced a 3-row speaker table with base rows copied
    emb = np.asarray(
        trainer.state.params["text2mel"]["speaker_emb"]["cvae"][
            "embedding_layer_spk"
        ]["embedding"]
    )
    assert emb.shape[0] == 3
    from viet_tts_tpu.infer.api import load_params

    base = load_params(base_ckpt)["params"]["text2mel"]["speaker_emb"]["cvae"][
        "embedding_layer_spk"
    ]["embedding"]
    np.testing.assert_allclose(emb[0], np.asarray(base)[0], rtol=1e-6)
    # epoch 0 (< threshold) trains on the adapter speaker only
    assert trainer.adapter_train_loader is not trainer.all_train_loader
    trainer.run()
