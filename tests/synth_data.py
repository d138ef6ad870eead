"""Synthetic tiny dataset builder for end-to-end pipeline tests."""

import json
import os

import numpy as np

from viet_tts_tpu.dsp.audio import write_wav

WORDS = (
    "xin chào các bạn tôi là một hệ thống tổng hợp tiếng nói hôm nay "
    "trời đẹp quá chúng ta cùng nhau học tập và làm việc thật tốt"
).split()


def build_dataset(root, n_utts=12, sr=22050, seed=0, speakers=("hn_spk", "hcm_spk")):
    """data_dir layout: <root>/<spk>/{metadata.csv,wavs/}, accent from the
    basename prefix. Returns (data_dir, egs_dir)."""
    rng = np.random.RandomState(seed)
    data_dir = os.path.join(root, "data")
    egs_dir = os.path.join(root, "egs")
    os.makedirs(egs_dir, exist_ok=True)

    for spk in speakers:
        wav_dir = os.path.join(data_dir, spk, "wavs")
        os.makedirs(wav_dir, exist_ok=True)
        accent = spk.split("_")[0]
        rows = []
        for i in range(n_utts):
            # fixed word count + two wav lengths keep every utterance in ONE
            # (text, mel) bucket -> a single train-step trace/compile, and
            # only two mel-extraction shapes (the suite is tracing-bound)
            n_words = 3
            text = " ".join(rng.choice(WORDS, n_words))
            dur_s = 1.0 if i % 2 == 0 else 1.2
            t = np.arange(int(sr * dur_s)) / sr
            f0 = 120 + 60 * rng.rand()
            audio = 0.3 * np.sin(2 * np.pi * f0 * t) * (
                0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t)
            )
            audio += 0.01 * rng.randn(len(t))
            fname = f"{accent}-{i:04d}.wav"
            write_wav(os.path.join(wav_dir, fname), audio.astype(np.float32), sr)
            rows.append(f"{fname}|{text}")
        with open(
            os.path.join(data_dir, spk, "metadata.csv"), "w", encoding="utf8"
        ) as f:
            f.write("\n".join(rows))

    with open(os.path.join(egs_dir, "speakers.json"), "w") as f:
        json.dump({spk: i for i, spk in enumerate(speakers)}, f)
    with open(os.path.join(egs_dir, "accents.json"), "w") as f:
        json.dump({"hn": 0, "hcm": 1}, f)
    return data_dir, egs_dir


def tiny_model_config(conf, task="fastspeech2", block="transformer"):
    """Shrink the model section for fast CPU tests."""
    m = conf["models"][task]
    m.update(
        encoder_layers=1, encoder_hidden=32, decoder_layers=1, decoder_hidden=32
    )
    m["building_block"]["block_type"] = block
    m["building_block"]["transformer"]["conv_filter_size"] = 64
    m["vcae"].update(
        conv_layers=3, conv_chans_list=[8, 8, 16], gru_units=16
    )
    m["postnet"].update(embedding_dim=32, conv_layers=3)
    m["variance"]["variance_predictor"]["filter_size"] = 16
    m["variance"]["variance_embedding"]["n_bins"] = 16
    m["variance"]["duration_modelling"]["binarization_start_steps"] = 4
    return conf
