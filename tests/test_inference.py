"""Two-stage inference API test: train tiny FS2 + HiFi-GAN, then text->wav."""

import argparse
import os

import numpy as np
import pytest

from viet_tts_tpu.config import build_config

from tests.synth_data import build_dataset, tiny_model_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _args(task, egs, data, out, max_iter=2):
    return argparse.Namespace(
        task=task,
        input_folder=egs,
        data_folder=data,
        output_folder=out,
        checkpoint=None,
        acoustic_checkpoint=None,
        vocoder_checkpoint=None,
        version="fastspeech2",
        max_iter=max_iter,
        is_finetune=False,
    )


@pytest.fixture(scope="module")
def trained_ckpts(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("two_stage"))
    data_dir, egs_dir = build_dataset(root, n_utts=4)

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

    from viet_tts_tpu.train.gan import HiFiGANTrainer
    from viet_tts_tpu.train.trainer import FastSpeech2Trainer

    ac_out = os.path.join(root, "ac")
    FastSpeech2Trainer(
        _args("fastspeech2", egs_dir, data_dir, ac_out), conf
    ).run()
    voc_out = os.path.join(root, "voc")
    HiFiGANTrainer(_args("hifigan", egs_dir, data_dir, voc_out), conf).run()
    return ac_out, voc_out


def test_two_stage_tts(trained_ckpts):
    from viet_tts_tpu.infer.api import TwoStageTTS, save_to_local

    ac_out, voc_out = trained_ckpts
    tts = TwoStageTTS(ac_out, voc_out, model_type="FASTSPEECH2", max_mel_frames=256)
    waves = tts(
        ["xin chào các bạn", "hôm nay trời đẹp quá ."], speaker="hn_spk", accent="hn"
    )
    assert len(waves) == 2
    for w in waves:
        assert w.ndim == 1 and np.isfinite(w).all()
        assert (np.abs(w) <= 1.0).all()
    # mel lengths differ between sentences -> different audio lengths
    assert len(waves[0]) % 256 == 0

    path = save_to_local(waves[0], os.path.join(ac_out, "sample.wav"), tts.sr)
    assert os.path.exists(path)


def test_two_stage_controls(trained_ckpts):
    from viet_tts_tpu.infer.api import TwoStageTTS

    ac_out, voc_out = trained_ckpts
    tts = TwoStageTTS(ac_out, voc_out, max_mel_frames=256)
    slow = tts(["xin chào các bạn"], d_control=1.5)
    fast = tts(["xin chào các bạn"], d_control=0.5)
    # duration control stretches synthesized length
    assert len(slow[0]) >= len(fast[0])


def test_one_stage_vits2(tmp_path):
    """Train a tiny VITS2 then synthesize through OneStageTTS."""
    import argparse

    from tests.test_vits2 import TINY_HP
    from viet_tts_tpu.train.vits2_trainer import VITS2Trainer

    data_dir, egs_dir = build_dataset(str(tmp_path), n_utts=4)
    conf = build_config(os.path.join(REPO, "config"))
    conf["train"]["batch_size"] = 2
    conf["models"]["vits2"] = dict(TINY_HP)
    out = os.path.join(str(tmp_path), "out")
    args = argparse.Namespace(
        task="vits2",
        input_folder=egs_dir,
        data_folder=data_dir,
        output_folder=out,
        checkpoint=None,
        acoustic_checkpoint=None,
        vocoder_checkpoint=None,
        version="fastspeech2",
        max_iter=1,
        is_finetune=False,
    )
    VITS2Trainer(args, conf).run()

    from viet_tts_tpu.infer.api import OneStageTTS

    tts = OneStageTTS(out, model_type="VITS2", max_mel_frames=128)
    waves = tts(["xin chào các bạn"], speaker="hn_spk")
    assert len(waves) == 1
    assert waves[0].ndim == 1 and np.isfinite(waves[0]).all()


def test_two_stage_half_precision(trained_ckpts):
    from viet_tts_tpu.infer.api import TwoStageTTS

    ac_out, voc_out = trained_ckpts
    tts = TwoStageTTS(ac_out, voc_out, max_mel_frames=256, half=True)
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tts.vocoder_vars)
    assert all(
        l.dtype == jnp.bfloat16 for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)
    )
    waves = tts(["xin chào các bạn"], speaker="hn_spk", accent="hn")
    assert waves[0].dtype == np.float32
    assert np.isfinite(waves[0]).all() and (np.abs(waves[0]) <= 1.0).all()


def test_two_stage_data_parallel(trained_ckpts):
    """Batch sharded over the 8-device CPU mesh; weights replicated."""
    import jax

    from viet_tts_tpu.infer.api import TwoStageTTS

    ac_out, voc_out = trained_ckpts
    tts = TwoStageTTS(ac_out, voc_out, max_mel_frames=256, data_parallel=True)
    assert tts.mesh is not None and tts.mesh.devices.size == len(jax.devices())
    # 3 texts -> padded to 8 internally, sliced back to 3
    waves = tts(
        ["xin chào các bạn", "hôm nay trời đẹp", "chúng ta đi chơi"],
        speaker="hn_spk",
        accent="hn",
    )
    assert len(waves) == 3
    for w in waves:
        assert np.isfinite(w).all()
    # matches the unsharded result
    ref = TwoStageTTS(ac_out, voc_out, max_mel_frames=256)
    ref_waves = ref(["xin chào các bạn"], speaker="hn_spk", accent="hn")
    np.testing.assert_allclose(waves[0], ref_waves[0], atol=2e-5)


def test_two_stage_sequence_parallel(trained_ckpts):
    """Sequence-parallel serving: the vocoder's time axis spatially
    partitioned over the 8-device CPU mesh, waveform identical to the
    single-device graph (batch axis untouched)."""
    from viet_tts_tpu.infer.api import TwoStageTTS

    ac_out, voc_out = trained_ckpts
    tts = TwoStageTTS(
        ac_out, voc_out, max_mel_frames=256, sequence_parallel=True
    )
    assert tts.mesh is None and tts._seq_sharding is not None
    waves = tts(["xin chào các bạn"], speaker="hn_spk", accent="hn")
    ref = TwoStageTTS(ac_out, voc_out, max_mel_frames=256)
    ref_waves = ref(["xin chào các bạn"], speaker="hn_spk", accent="hn")
    np.testing.assert_allclose(waves[0], ref_waves[0], atol=2e-5)


def test_two_stage_pipeline_parallel(trained_ckpts):
    """Pipeline-parallel serving: acoustic stage committed to device 0,
    vocoder to device 1 (async dispatch overlaps successive batches);
    waveforms identical to the single-device graph."""
    import jax

    from viet_tts_tpu.infer.api import TwoStageTTS

    ac_out, voc_out = trained_ckpts
    tts = TwoStageTTS(
        ac_out, voc_out, max_mel_frames=256, pipeline_parallel=True
    )
    assert tts._pp_voc_device is not None
    ac_devs = jax.tree_util.tree_leaves(tts.acoustic_vars)[0].devices()
    voc_devs = jax.tree_util.tree_leaves(tts.vocoder_vars)[0].devices()
    assert ac_devs != voc_devs
    texts = ["xin chào các bạn", "hôm nay trời đẹp"]
    waves = tts(texts, speaker="hn_spk", accent="hn")
    ref = TwoStageTTS(ac_out, voc_out, max_mel_frames=256)
    ref_waves = ref(texts, speaker="hn_spk", accent="hn")
    for w, r in zip(waves, ref_waves):
        np.testing.assert_allclose(w, r, atol=2e-5)
