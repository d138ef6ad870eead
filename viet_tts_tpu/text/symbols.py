"""Phoneme symbol inventory for Vietnamese TTS.

The model consumes integer phoneme ids drawn from a 131-entry table laid out
as ``specials + onsets + medials + (vowel x tone) + codas``, with the tone
fused into the vowel symbol (the ``C1 w V_T C2`` format). The table must be
kept in this exact order: checkpoints store embedding rows indexed by it.

Parity: reference `modules/g2p/symbols.py:22-50` (131 symbols; the CMU
English set the reference defines is disabled there and is omitted here).
"""

from __future__ import annotations

from typing import Dict, List

# Special tokens: padding, intra-sentence silence, inter-word space, end of
# sentence. `<PAD>` must be id 0 (embeddings are zero-padded against it).
PAD = "<PAD>"
SILENT = "<SILENT>"
SPACE = "<SPACE>"
EOS = "</S>"
SPECIALS: List[str] = [PAD, SILENT, SPACE, EOS]

# Syllable-initial consonants (onsets), alphabetical.
ONSETS: List[str] = [
    "b", "ch", "d", "dd", "g", "h", "k", "kh", "kw", "l", "m", "n",
    "ng", "nh", "p", "ph", "r", "s", "t", "th", "tr", "v", "x",
]

# Medial glides (/w/ written as "o"/"u").
MEDIALS: List[str] = ["wo", "wu"]

# Syllable nuclei: 12 monophthongs followed by 3 diphthongs.
NUCLEI: List[str] = [
    "a", "aa", "aw", "e", "ee", "i", "o", "oa", "oo", "ow", "u", "uw",
    "ie", "uo", "wa",
]

# Six tones: 0 ngang, 1 sắc, 2 huyền, 3 hỏi, 4 ngã, 5 nặng.
TONES: List[str] = ["0", "1", "2", "3", "4", "5"]

# Syllable-final consonants / offglides (codas), suffixed with "z".
CODAS: List[str] = [
    "cz", "iz", "kz", "mz", "ngz", "nhz", "nz", "oz", "pz", "tz", "uz", "yz",
]

# Full table, upper-cased. Tone is fused: one symbol per (nucleus, tone).
SYMBOLS: List[str] = [
    s.upper()
    for s in (
        SPECIALS
        + ONSETS
        + MEDIALS
        + [f"{v}_{t}" for v in NUCLEI for t in TONES]
        + CODAS
    )
]

assert len(SYMBOLS) == 131, len(SYMBOLS)

SYMBOL_TO_ID: Dict[str, int] = {s: i for i, s in enumerate(SYMBOLS)}
ID_TO_SYMBOL: Dict[int, str] = {i: s for i, s in enumerate(SYMBOLS)}

NUM_SYMBOLS: int = len(SYMBOLS)
PAD_ID: int = SYMBOL_TO_ID[PAD]
EOS_ID: int = SYMBOL_TO_ID[EOS]


def symbols_to_ids(seq) -> List[int]:
    """Map phoneme symbols to integer ids.

    Accepts a list of symbols or a space-separated string. A trailing stress
    digit on ``@CMU``-prefixed tokens is stripped for compatibility with
    filelists produced by the reference (`modules/g2p/__init__.py:9-12`),
    although the English set is not part of the active table.
    """
    if isinstance(seq, str):
        seq = seq.split()
    out = []
    for s in seq:
        if s.startswith("@") and s[-1].isdigit():
            s = s[:-1]
        out.append(SYMBOL_TO_ID[s])
    return out


def ids_to_symbols(seq) -> str:
    """Inverse of :func:`symbols_to_ids`; joins with underscores."""
    if isinstance(seq, str):
        seq = seq.split()
    return "_".join(ID_TO_SYMBOL[int(s)] for s in seq)
