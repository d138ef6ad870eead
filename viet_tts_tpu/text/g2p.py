"""Rule-based Vietnamese grapheme-to-phoneme conversion.

Decomposes each orthographic syllable into onset (C1) + medial glide (w) +
nucleus-with-tone (V_T) + coda (C2) using the standard analysis of quốc-ngữ
spelling. Tone marks are recognised through Unicode NFD decomposition (the
five combining marks U+0300/0301/0303/0309/0323) rather than lookup tables.

Behavioural parity with the reference front-end (`modules/g2p/main.py`,
verified by golden tests in `tests/test_g2p.py`):
- orthographic pre-fixes for "guo-", non-final "âu"/"ây"/"ao" (`main.py:63-70`)
- "gi"/"qu" onset disambiguation (`main.py:112-118`)
- medial-glide and offglide splitting of vowel runs (`main.py:120-125`)
- the "o" → "oo" nucleus before n/t/i codas (`main.py:131-133`)
- punctuation → <SILENT> / </S>, hyphenated compounds with nucleus dropping
  on non-final parts (`main.py:162-170`)
- per-word phoneme-count boundaries for word-level duration losses.
"""

from __future__ import annotations

import json
import re
import string
import unicodedata
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

_WHITESPACE = re.compile(r"\s+")

# Combining marks that carry tone in NFD order: sắc, huyền, hỏi, ngã, nặng.
_TONE_OF_MARK = {
    "́": 1,  # acute
    "̀": 2,  # grave
    "̉": 3,  # hook above
    "̃": 4,  # tilde
    "̣": 5,  # dot below
}

_VOWEL_LETTERS = frozenset("aeiouy")


def fold_ascii(text: str) -> str:
    """Strip every diacritic (tone, breve, circumflex, horn) to bare ASCII."""
    text = text.replace("đ", "d").replace("Đ", "D")  # đ/Đ
    decomposed = unicodedata.normalize("NFD", text)
    return "".join(c for c in decomposed if unicodedata.category(c) != "Mn")


def split_tone(word: str) -> Tuple[str, int]:
    """Remove the first tone mark found and report its class (0 = level).

    Vietnamese orthography carries at most one tone mark per syllable; the
    remaining diacritics (quality marks like circumflex/horn/breve) are kept.
    """
    for i, ch in enumerate(word):
        parts = unicodedata.normalize("NFD", ch)
        kept = [c for c in parts if c not in _TONE_OF_MARK]
        if len(kept) != len(parts):
            tone = next(_TONE_OF_MARK[c] for c in parts if c in _TONE_OF_MARK)
            bare = unicodedata.normalize("NFC", "".join(kept))
            return word[:i] + bare + word[i + 1 :], tone
    return word, 0


class VietnameseG2P:
    """Vietnamese phoneme tokenizer producing 131-table symbols."""

    # Onset graphemes -> phonemes. Digraph/trigraph spellings of the same
    # phoneme (c/k/q, g/gh, ng/ngh) collapse; "gi" devoices to /z/ ("d").
    ONSET_MAP: Dict[str, str] = {
        "b": "b", "c": "k", "ch": "ch", "d": "d", "đ": "dd", "g": "g",
        "gh": "g", "gi": "d", "h": "h", "k": "k", "kh": "kh", "l": "l",
        "m": "m", "n": "n", "ng": "ng", "ngh": "ng", "nh": "nh", "p": "p",
        "ph": "ph", "q": "k", "qu": "kw", "r": "r", "s": "s", "t": "t",
        "th": "th", "tr": "tr", "v": "v", "x": "x",
    }

    # Medial glide spellings.
    GLIDE_MAP: Dict[str, str] = {"o": "wo", "u": "wu"}

    # Single-vowel nuclei. "o" is open /ɔ/ ("oa" in the table), the doubled
    # spelling "oo" is closed /o/ ("o"), circumflex "ô" is "oo".
    NUCLEUS_MAP: Dict[str, str] = {
        "a": "a", "â": "aa", "ă": "aw", "e": "e", "ê": "ee", "i": "i",
        "y": "i", "o": "oa", "oo": "o", "ô": "oo", "ơ": "ow", "u": "u",
        "ư": "uw",
    }

    # Diphthong spellings (ia/iê/ya/yê, ưa/ươ, ua/uô).
    DIPHTHONG_MAP: Dict[str, str] = {
        "ia": "ie", "iê": "ie", "ya": "ie", "yê": "ie",
        "ưa": "wa", "ươ": "wa",
        "ua": "uo", "uô": "uo",
    }

    # Coda graphemes -> phonemes ("z"-suffixed in the symbol table).
    CODA_MAP: Dict[str, str] = {
        "c": "cz", "ch": "kz", "i": "iz", "k": "cz", "m": "mz", "n": "nz",
        "ng": "ngz", "nh": "nhz", "o": "oz", "p": "pz", "t": "tz",
        "u": "uz", "y": "yz",
    }

    def __init__(self, dict_dir: Optional[str] = None):
        if dict_dir is None:
            dict_dir = Path(__file__).parent / "dict"
        dict_dir = Path(dict_dir)

        import gzip

        words_gz = dict_dir / "vietnamese_words.txt.gz"
        words_txt = dict_dir / "vietnamese_words.txt"
        if words_gz.exists():
            raw = gzip.decompress(words_gz.read_bytes()).decode("utf8")
        elif words_txt.exists():
            raw = words_txt.read_text(encoding="utf8")
        else:
            raw = ""
        # Known-Vietnamese vocabulary used by the filelist builders to drop
        # sentences containing foreign words.
        self.vocabulary: List[str] = [w for w in raw.split("\n") if w]
        self.vocab_set = frozenset(self.vocabulary)

        fw = dict_dir / "foreign_words.json"
        # {word: {"vietlish": respelling}} substitutions applied pre-G2P.
        self.foreign_words: Dict[str, dict] = (
            json.loads(fw.read_text(encoding="utf8")) if fw.exists() else {}
        )

    # ------------------------------------------------------------------
    # Syllable level
    # ------------------------------------------------------------------

    @staticmethod
    def _orthographic_fix(word: str) -> str:
        """Respell irregular sequences before analysis (`main.py:63-70`)."""
        if word.startswith("guo") and len(word) > 3:
            word = "go" + word[3:]
        if "âu" in word and not word.endswith("âu"):
            word = word.replace("âu", "ô")
        if "ây" in word and not word.endswith("ây"):
            word = word.replace("ây", "i")
        if "ao" in word and not word.endswith("ao"):
            word = word.replace("ao", "o")
        return word

    @staticmethod
    def _vowel_consonant_runs(word: str) -> List[str]:
        """Split into maximal runs of vowel letters vs consonant letters,
        normalised to [onset, vowels, coda, ...] with "" placeholders."""
        runs: List[str] = []
        run_is_vowel: Optional[bool] = None
        for ch in word:
            is_vowel = fold_ascii(ch) in _VOWEL_LETTERS
            if is_vowel == run_is_vowel:
                runs[-1] += ch
            else:
                runs.append(ch)
                run_is_vowel = is_vowel
        if runs and fold_ascii(runs[0][0]) in _VOWEL_LETTERS:
            runs.insert(0, "")
        while len(runs) < 3:
            runs.append("")
        return runs

    def phonemize_syllable(
        self, word: str, drop_nucleus: bool = False
    ) -> List[str]:
        """One syllable -> [C1?, w?, V_T, C2?] phoneme list (lower case).

        ``drop_nucleus`` handles non-final parts of hyphenated loanwords
        spelled consonant+"ờ" ("sờ-mát" -> S MZ A_1 TZ), keeping only the
        onset consonant (`main.py:80-82`).
        """
        if drop_nucleus and word.endswith("ờ") and word[:-1] in self.ONSET_MAP:
            return [self.ONSET_MAP[word[:-1]]]

        word, tone = split_tone(self._orthographic_fix(word))
        parts = self._vowel_consonant_runs(word)
        bare = [fold_ascii(p) for p in parts]

        if parts[1]:
            # "gi" spells onset /z/ unless the "i" itself is the nucleus;
            # "qu" spells /kw/ except bare "qu" (= /ku/).
            if bare[0] == "g" and bare[1][0] == "i":
                parts[0] = "d"
                keep_i = bare[1] in ("i", "ieu") or (
                    parts[1] == "iê" and bool(parts[2])
                )
                if not keep_i:
                    parts[1] = parts[1][1:]
            elif bare[0] == "q" and bare[1][0] == "u":
                parts[0] = "qu" if parts[1] != "u" else "c"
                if bare[1] != "u":
                    parts[1] = parts[1][1:]

            if len(parts[1]) > 1:
                # Trailing u/o/i/y after a non-diphthong nucleus is an
                # offglide coda when no consonant coda follows.
                if (
                    parts[1][-1] in "uoiy"
                    and parts[1] not in self.DIPHTHONG_MAP
                    and not parts[2]
                ):
                    parts[2] = parts[1][-1]
                    parts[1] = parts[1][:-1]
                # Leading u/o before a non-diphthong nucleus is the medial
                # glide; mark the boundary with a space.
                if (
                    parts[1][0] in "uo"
                    and parts[1] not in self.DIPHTHONG_MAP
                    and parts[1] != "oo"
                ):
                    parts[1] = parts[1][0] + " " + parts[1][1:]

        onset = self.ONSET_MAP.get(parts[0], "")
        if parts[1]:
            nucleus_parts = parts[1].split()
            # Open "o" before n/t/i codas is actually closed /o/.
            if (
                len(nucleus_parts) == 1
                and nucleus_parts[-1] == "o"
                and parts[2] in ("n", "t", "i")
            ):
                nucleus_parts[-1] = "oo"
            glide = (
                self.GLIDE_MAP[nucleus_parts[0]]
                if len(nucleus_parts) == 2
                else ""
            )
            last = nucleus_parts[-1]
            vowel = (
                self.DIPHTHONG_MAP[last]
                if len(last) == 2 and last != "oo"
                else self.NUCLEUS_MAP[last]
            )
        else:
            glide = vowel = ""

        coda = self.CODA_MAP.get(parts[2], "")
        phones = [onset, glide, f"{vowel}_{tone}", coda]
        return [p for p in phones if p]

    # ------------------------------------------------------------------
    # Sentence level
    # ------------------------------------------------------------------

    def g2p(
        self,
        text: Union[str, Sequence[str]],
        foreign_dict: Optional[dict] = None,
        get_boundary: bool = True,
    ):
        """Phonemize a sentence.

        Returns ``(phonemes, boundaries)`` where ``boundaries[k]`` is the
        phoneme count of word k (a list of counts for hyphenated compounds),
        or just the phoneme list (with a guaranteed trailing </S>) when
        ``get_boundary`` is False. Matches `main.py:150-193`.
        """
        if foreign_dict is None:
            foreign_dict = self.foreign_words
        words = text.split() if isinstance(text, str) else list(text)

        per_word: List[Union[List[str], List[List[str]]]] = []
        for i, word in enumerate(words):
            if foreign_dict and word in foreign_dict:
                word = foreign_dict[word]["vietlish"]

            if "-" in word:
                # drop_nucleus applies to every part but the last, judged by
                # position in the raw split (empty parts are then skipped).
                pieces = word.split("-")
                per_word.append(
                    [
                        self.phonemize_syllable(
                            p, drop_nucleus=(j < len(pieces) - 1)
                        )
                        for j, p in enumerate(pieces)
                        if p
                    ]
                )
            elif word in string.punctuation:
                per_word.append(
                    [SILENT_LOWER] if i < len(words) - 1 else [EOS_LOWER]
                )
            else:
                per_word.append(self.phonemize_syllable(word))

        phonemes: List[str] = []
        boundaries: List[Union[int, List[int]]] = []
        for seq in per_word:
            if seq is None:
                continue
            if seq and isinstance(seq[0], list):
                for syl in seq:
                    phonemes.extend(syl)
                boundaries.append([len(syl) for syl in seq])
            else:
                phonemes.extend(seq)
                boundaries.append(len(seq))

        phonemes = [p.upper() for p in phonemes]

        if get_boundary:
            if phonemes and phonemes[-1] == "<SILENT>":
                phonemes[-1] = "</S>"
            return phonemes, boundaries
        if not phonemes or phonemes[-1] != "</S>":
            phonemes.append("</S>")
        return phonemes

    def __call__(
        self,
        text: str,
        foreign_dict: Optional[dict] = None,
        get_boundary: bool = True,
    ):
        text = _WHITESPACE.sub(" ", text.lower())
        return self.g2p(text, foreign_dict=foreign_dict, get_boundary=get_boundary)


SILENT_LOWER = "<silent>"
EOS_LOWER = "</s>"
