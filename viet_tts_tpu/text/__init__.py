"""Linguistic front-end: symbols, Vietnamese G2P, text normalization."""

from viet_tts_tpu.text.symbols import (
    SYMBOLS,
    SYMBOL_TO_ID,
    ID_TO_SYMBOL,
    NUM_SYMBOLS,
    PAD_ID,
    EOS_ID,
    symbols_to_ids,
    ids_to_symbols,
)
from viet_tts_tpu.text.g2p import VietnameseG2P, fold_ascii, split_tone
from viet_tts_tpu.text.normalizer import basic_clean, canonicalize_tone_marks

__all__ = [
    "SYMBOLS",
    "SYMBOL_TO_ID",
    "ID_TO_SYMBOL",
    "NUM_SYMBOLS",
    "PAD_ID",
    "EOS_ID",
    "symbols_to_ids",
    "ids_to_symbols",
    "VietnameseG2P",
    "fold_ascii",
    "split_tone",
    "basic_clean",
    "canonicalize_tone_marks",
]
