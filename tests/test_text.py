"""Golden tests for the Vietnamese text front-end.

Goldens in tests/golden/g2p_golden.json were produced by running the
reference implementation (`/root/reference/modules/g2p/main.py`) over a
400-word sample of the vocabulary plus representative sentences. When the
reference checkout is present, a full-vocabulary live parity sweep also runs.
"""

import json
import pathlib
import sys
import types

import pytest

from viet_tts_tpu.text import (
    NUM_SYMBOLS,
    SYMBOLS,
    PAD_ID,
    VietnameseG2P,
    basic_clean,
    fold_ascii,
    split_tone,
    symbols_to_ids,
    ids_to_symbols,
)

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "golden" / "g2p_golden.json").read_text()
)
REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="module")
def g2p():
    return VietnameseG2P()


def test_symbol_table_shape():
    assert NUM_SYMBOLS == 131
    assert SYMBOLS[0] == "<PAD>" and PAD_ID == 0
    assert SYMBOLS[1] == "<SILENT>"
    assert SYMBOLS[3] == "</S>"
    assert len(set(SYMBOLS)) == 131


def test_symbols_roundtrip():
    ids = symbols_to_ids("B A_1 NZ </S>")
    assert ids_to_symbols(ids) == "B_A_1_NZ_</S>"


def test_fold_ascii():
    assert fold_ascii("đường") == "duong"
    assert fold_ascii("ắẳỗựỵ") == "aaouy"


def test_split_tone():
    assert split_tone("bàn") == ("ban", 2)
    assert split_tone("quyết") == ("quyêt", 1)
    assert split_tone("ngang") == ("ngang", 0)
    assert split_tone("mỹ") == ("my", 4)


def test_golden_words(g2p):
    for word, phones in GOLDEN["words"].items():
        assert g2p.phonemize_syllable(word) == phones, word


def test_golden_sentences(g2p):
    for case in GOLDEN["sentences"]:
        ph, b = g2p(case["text"])
        assert ph == case["phonemes"], case["text"]
        assert b == case["boundaries"], case["text"]


def test_all_phonemes_in_table(g2p):
    for case in GOLDEN["sentences"]:
        ids = symbols_to_ids(case["phonemes"])
        assert all(0 <= i < NUM_SYMBOLS for i in ids)


def test_get_boundary_false_appends_eos(g2p):
    seq = g2p("hôm nay trời đẹp", get_boundary=False)
    assert seq[-1] == "</S>"


def test_trailing_punctuation_becomes_eos(g2p):
    ph, _ = g2p("hôm nay trời đẹp .")
    assert ph[-1] == "</S>"


def test_basic_clean_tone_position():
    assert basic_clean("hòa  bình") == "hoà bình"
    assert basic_clean("thúy") == "thuý"


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_full_vocabulary_parity_vs_reference(g2p):
    """Live sweep: every vocabulary word matches the reference G2P."""
    sys.modules.setdefault(
        "unidecode", types.SimpleNamespace(unidecode=fold_ascii)
    )
    sys.modules.setdefault("g2p_en", types.SimpleNamespace(G2p=type("G2p", (), {})))
    sys.path.insert(0, str(REFERENCE))
    try:
        from modules.g2p.main import G2p_vi  # noqa: reference import

        ref = G2p_vi()
        diffs = [
            w
            for w in ref.vn_words
            if ref.build_phoneme(w) != g2p.phonemize_syllable(w)
        ]
        assert not diffs, diffs[:10]
    finally:
        sys.path.remove(str(REFERENCE))


def test_split_sentences():
    from viet_tts_tpu.infer.api import split_sentences

    text = (
        "hôm nay trời đẹp quá. chúng ta đi chơi nhé! "
        + " ".join(["từ"] * 100)
        + ", rồi về nhà."
    )
    parts = split_sentences(text, max_words=40)
    assert parts[0] == "hôm nay trời đẹp quá."
    assert parts[1] == "chúng ta đi chơi nhé!"
    assert all(len(p.split()) <= 40 for p in parts)
    # nothing lost
    assert sum(len(p.split()) for p in parts) == len(text.split())
