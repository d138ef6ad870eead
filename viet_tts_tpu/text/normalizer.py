"""Text normalization helpers for Vietnamese input.

Canonicalises "old-style" tone-mark placement (tone on the first vowel of
oa/oe/uy clusters) to the modern convention (tone on the second vowel), the
same mapping the reference carries in `modules/processor/text_processor.py`.
Implemented generatively from the cluster list rather than a literal table.
"""

from __future__ import annotations

import re
import unicodedata

_TONE_MARKS = "̣́̀̉̃"  # sắc huyền hỏi ngã nặng

# Vowel clusters whose tone mark moves from the first to the second letter.
_CLUSTERS = [("o", "a"), ("o", "e"), ("u", "y")]


def _build_map():
    nfc = lambda s: unicodedata.normalize("NFC", s)
    mapping = {}
    for first, second in _CLUSTERS:
        for mark in _TONE_MARKS:
            for f, s in (
                (first, second),  # òa -> oà
                (first.upper(), second),  # Òa -> Oà
                (first.upper(), second.upper()),  # ÒA -> OÀ
            ):
                mapping[nfc(f + mark + s)] = nfc(f + s + mark)
    return mapping


TONE_POSITION_MAP = _build_map()


def canonicalize_tone_marks(text: str) -> str:
    """Move tone marks to the modern position in oa/oe/uy clusters."""
    for old, new in TONE_POSITION_MAP.items():
        if old in text:
            text = text.replace(old, new)
    return text


_WS = re.compile(r"\s+")


def basic_clean(text: str) -> str:
    """NFC-normalise, canonicalise tone positions, and collapse whitespace."""
    text = unicodedata.normalize("NFC", text)
    text = canonicalize_tone_marks(text)
    return _WS.sub(" ", text).strip()
