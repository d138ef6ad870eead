"""AOT serving export (`infer/export.py`).

Round-trip: export a tiny one-stage JETS serving graph with `jax.export`,
reload the artifact WITHOUT constructing any model class, and match the
direct `OneStageTTS` call sample-for-sample. This is the deployment layer
the reference lacks (its `test.py` rebuilds the torch model from source on
every load).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from viet_tts_tpu.config import build_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_jets_ckpt(tmp_path):
    """Random-init tiny JETS saved as a real checkpoint dir + sidecars."""
    from tests.test_jets import TINY_HP
    from viet_tts_tpu.models.jets import JETS
    from viet_tts_tpu.train import checkpoint as ckpt

    conf = build_config(os.path.join(REPO, "config"))
    conf["models"]["jets"]["generator_params"] = dict(TINY_HP)

    model = JETS(n_symbols=131, n_channels=80, hparams=dict(TINY_HP),
                 n_speakers=2)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key, "noise": key},
        jnp.zeros(1, jnp.int32),
        jnp.zeros((1, 16), jnp.int32),
        jnp.ones(1, jnp.int32) * 16,
        64,
        method=model.inference,
    )
    out = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(
        out, "generator", 0, 0,
        {"params": jax.device_get(variables["params"])},
    )
    ckpt.save_information(out, conf, speakers={"spk": 0}, accents={})
    return out


def test_export_one_stage_roundtrip(tmp_path):
    from viet_tts_tpu.infer.api import OneStageTTS
    from viet_tts_tpu.infer.export import (
        ARTIFACT,
        META,
        WEIGHTS,
        ExportedTTS,
        export_one_stage,
    )

    ckpt_dir = _tiny_jets_ckpt(tmp_path)
    tts = OneStageTTS(ckpt_dir, model_type="JETS", max_mel_frames=64,
                      packed_vocoder=False)
    art = str(tmp_path / "artifact")
    export_one_stage(tts, art, batch=2, text_len=32)
    for name in (ARTIFACT, WEIGHTS, META):
        assert os.path.exists(os.path.join(art, name))

    served = ExportedTTS(art)
    texts = ["xin chào các bạn", "một hai ba"]
    ref = tts(texts, speaker="spk")
    got = served(texts, speaker="spk")
    assert len(got) == len(ref) == 2
    for r, g in zip(ref, got):
        assert g.shape == r.shape
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5)


def _tiny_two_stage_ckpts(tmp_path):
    """Tiny FS2 + HiFiGAN checkpoint dirs (random init via the tolerant
    loader: empty params payloads keep the fresh initialization)."""
    from viet_tts_tpu.train import checkpoint as ckpt

    conf = build_config(os.path.join(REPO, "config"))
    m = conf["models"]["fastspeech2"]
    m.update(encoder_layers=1, encoder_hidden=32, decoder_layers=1,
             decoder_hidden=32)
    m["building_block"]["block_type"] = "transformer"
    m["building_block"]["transformer"]["conv_filter_size"] = 64
    m["vcae"].update(conv_layers=3, conv_chans_list=[8, 8, 16], gru_units=16)
    m["postnet"].update(embedding_dim=32, conv_layers=3)
    m["variance"]["variance_predictor"]["filter_size"] = 16
    m["variance"]["variance_embedding"]["n_bins"] = 16
    conf["models"]["hifigan"] = {
        "upsample_initial_channel": 32,
        "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
    }
    ac, voc = str(tmp_path / "acoustic"), str(tmp_path / "vocoder")
    for d in (ac, voc):
        ckpt.save_checkpoint(d, "generator", 0, 0, {"params": {}})
        ckpt.save_information(d, conf, speakers={"spk": 0},
                              accents={"acc": 0})
    return ac, voc


def test_export_two_stage_roundtrip(tmp_path):
    from viet_tts_tpu.infer.api import TwoStageTTS
    from viet_tts_tpu.infer.export import ExportedTTS, export_two_stage

    ac, voc = _tiny_two_stage_ckpts(tmp_path)
    tts = TwoStageTTS(ac, voc, model_type="FASTSPEECH2", max_mel_frames=64,
                      packed_vocoder=False)
    art = str(tmp_path / "artifact")
    export_two_stage(tts, art, batch=2, text_len=32)

    served = ExportedTTS(art)
    texts = ["xin chào các bạn", "một hai ba"]
    ref = tts(texts, speaker="spk", accent="acc")
    got = served(texts, speaker="spk", accent="acc")
    assert len(got) == len(ref) == 2
    for r, g in zip(ref, got):
        assert g.shape == r.shape
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5)


def test_export_rejects_mesh_serving(tmp_path):
    import pytest

    from viet_tts_tpu.infer.api import OneStageTTS
    from viet_tts_tpu.infer.export import export_one_stage

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    ckpt_dir = _tiny_jets_ckpt(tmp_path)
    tts = OneStageTTS(ckpt_dir, model_type="JETS", max_mel_frames=64,
                      packed_vocoder=False, data_parallel=True)
    with pytest.raises(ValueError, match="single-device"):
        export_one_stage(tts, str(tmp_path / "a"))


def test_export_multi_bucket(tmp_path):
    """Multi-signature artifact: the loader picks the smallest fitting
    bucket and matches the direct call at each."""
    from viet_tts_tpu.infer.api import OneStageTTS
    from viet_tts_tpu.infer.export import ExportedTTS, export_one_stage

    ckpt_dir = _tiny_jets_ckpt(tmp_path)
    tts = OneStageTTS(ckpt_dir, model_type="JETS", max_mel_frames=64,
                      packed_vocoder=False)
    art = str(tmp_path / "buckets")
    export_one_stage(tts, art, signatures=[(1, 16), (2, 32)])
    served = ExportedTTS(art)
    assert set(served._calls) == {(1, 16), (2, 32)}
    assert served._pick_signature(1, 10) == (1, 16)
    assert served._pick_signature(1, 20) == (2, 32)  # needs longer text
    assert served._pick_signature(2, 8) == (2, 32)   # needs batch 2

    (got_short,) = served(["ba"], speaker="spk")
    (ref_short,) = tts(["ba"], speaker="spk")
    np.testing.assert_allclose(got_short, ref_short, rtol=1e-4, atol=1e-4)

    got2 = served(["xin chào các bạn", "một hai ba"], speaker="spk")
    ref2 = tts(["xin chào các bạn", "một hai ba"], speaker="spk")
    for g, r in zip(got2, ref2):
        np.testing.assert_allclose(g, r, rtol=1e-4, atol=1e-4)

    import pytest

    with pytest.raises(ValueError, match="cannot serve"):
        served._pick_signature(3, 8)


def test_export_half_precision(tmp_path):
    """bf16 serving graph exports and round-trips (weights stored bf16,
    loader feeds matching dtypes)."""
    from viet_tts_tpu.infer.api import OneStageTTS
    from viet_tts_tpu.infer.export import ExportedTTS, export_one_stage

    ckpt_dir = _tiny_jets_ckpt(tmp_path)
    tts = OneStageTTS(ckpt_dir, model_type="JETS", max_mel_frames=64,
                      packed_vocoder=False, half=True)
    art = str(tmp_path / "artifact_bf16")
    export_one_stage(tts, art, batch=1, text_len=32)
    served = ExportedTTS(art)
    assert served.meta["half"] is True
    (ref,) = tts(["xin chào"], speaker="spk")
    (got,) = served(["xin chào"], speaker="spk")
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
