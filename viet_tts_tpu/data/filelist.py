"""Filelist builders: metadata.csv -> train.txt / test.txt.

Role of `src/tools/tools_for_data.py:22-94`, with the shipped defects fixed:
`create_unknown_filelist` writes the proper split to each file (the
reference wrote the full list to both) and takes its arguments in a sane
order.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional

from viet_tts_tpu.dsp.audio import read_wav
from viet_tts_tpu.text import VietnameseG2P


def _passes_length_filter(wav_path: str, hop: int = 256) -> bool:
    audio, _ = read_wav(wav_path)
    frames = int(len(audio) / hop - 1)
    return 64 <= frames <= 1000


def _format_row(path: str, speaker: str, phonemes: List[str], boundaries) -> str:
    return "|".join(
        [path, speaker, " ".join(phonemes), ", ".join(str(b) for b in boundaries)]
    )


def create_filelist(
    data_dir: str,
    speakers: Dict[str, int],
    out_dir: str,
    g2p: Optional[VietnameseG2P] = None,
    split: float = 0.95,
    seed: Optional[int] = None,
) -> None:
    """Per-speaker metadata.csv -> phonemized train/test filelists.

    Drops sentences containing out-of-vocabulary words and utterances
    outside 64-1000 mel frames, like the reference.
    """
    g2p = g2p or VietnameseG2P()
    rng = random.Random(seed)
    train_list, test_list = [], []
    allowed_extra = {",", "."}

    for spk in speakers:
        meta_path = os.path.join(data_dir, spk, "metadata.csv")
        with open(meta_path, "r", encoding="utf8") as f:
            rows = [line.split("|") for line in f.read().split("\n") if line]

        file_list = []
        for file_name, text in rows:
            wav = os.path.join(data_dir, spk, "wavs", file_name)
            if not os.path.exists(wav):
                continue
            if any(
                t not in g2p.vocab_set and t not in allowed_extra
                for t in text.split()
            ):
                continue
            if not _passes_length_filter(wav):
                continue
            phonemes, boundaries = g2p(text.replace("-", " "))
            file_list.append(_format_row(wav, spk, phonemes, boundaries))

        rng.shuffle(file_list)
        cut = int(split * len(file_list))
        train_list.extend(file_list[:cut])
        test_list.extend(file_list[cut:])

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "train.txt"), "w", encoding="utf8") as f:
        f.write("\n".join(train_list))
    with open(os.path.join(out_dir, "test.txt"), "w", encoding="utf8") as f:
        f.write("\n".join(test_list))


def create_unknown_filelist(
    data_dir: str,
    out_dir: str,
    g2p: Optional[VietnameseG2P] = None,
    split: float = 0.95,
    seed: Optional[int] = None,
) -> None:
    """Single-directory variant for finetune datasets without speaker table."""
    g2p = g2p or VietnameseG2P()
    rng = random.Random(seed)
    meta_path = os.path.join(data_dir, "metadata.csv")
    with open(meta_path, "r", encoding="utf8") as f:
        rows = [line.split("|") for line in f.read().split("\n") if line]

    file_list = []
    for file_name, text in rows:
        wav = os.path.join(data_dir, "wavs", file_name)
        if not os.path.exists(wav) or not _passes_length_filter(wav):
            continue
        phonemes, boundaries = g2p(text)
        file_list.append(_format_row(wav, wav, phonemes, boundaries))

    rng.shuffle(file_list)
    cut = int(split * len(file_list))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "train.txt"), "w", encoding="utf8") as f:
        f.write("\n".join(file_list[:cut]))
    with open(os.path.join(out_dir, "test.txt"), "w", encoding="utf8") as f:
        f.write("\n".join(file_list[cut:]))


def read_filelist(path: str) -> List[tuple]:
    with open(path, "r", encoding="utf8") as f:
        return [tuple(line.split("|")) for line in f.read().split("\n") if line]
