"""Text cleanup and word splitting.

Re-expresses the reference's scalar string stages:
- ``clean_up``: `api/LanguageDetector.kt:319-327` — trim, lowercase, strip
  numbers+punctuation (Unicode N*|P*), collapse ASCII whitespace runs to a
  single space. The reference fuses the two regex passes
  (`internal/util/extension/CharSequenceExtensions.kt:31-55`); we do one
  vectorized pass over codepoint category tables.
- ``word_list``: `internal/util/WordList.kt:18-80` — split at U+0020 and at
  logograms (each logogram is its own 1-char word); logogram =
  non-whitespace char whose script is HAN/HIRAGANA/KATAKANA/HANGUL
  (`internal/util/extension/CharExtensions.kt:25-39`).

Divergence (documented, see SURVEY.md §7): we use code-point semantics and
Python ``str.lower``; the reference operates on UTF-16 code units and
Kotlin ``lowercase()``. Our oracle is the parity target.
"""

from __future__ import annotations

import re

import numpy as np

from ..langdata import SCRIPTS_WITH_LOGOGRAMS
from ..uniscript import (
    CAT_NUMBER,
    CAT_PUNCT,
    SCRIPT_ID,
    cat_ids,
    codes_of,
    script_ids,
)

# Java String.trim strips chars <= U+0020 (LanguageDetector.kt:320).
_TRIM_RE = re.compile(r"^[\x00-\x20]+|[\x00-\x20]+$")
# Java default \s is ASCII-only: [ \t\n\x0B\f\r] (Constant.kt:162).
_ASCII_WS = frozenset(map(ord, " \t\n\x0b\f\r"))
# codepoint<=0x20 -> is-ASCII-whitespace LUT (hot path: one gather beats
# np.isin's per-call sort; codes above 0x20 are clamped to 0x20 and then
# masked back out by the <=0x20 test)
_WS_LUT = np.zeros(0x21, dtype=bool)
_WS_LUT[sorted(_ASCII_WS)] = True

LOGO_SCRIPT_IDS = np.array(
    sorted(SCRIPT_ID[s] for s in SCRIPTS_WITH_LOGOGRAMS), dtype=np.uint8
)
# script id -> is-logogram boolean (faster than np.isin in the hot path)
_LOGO_BY_SID = np.zeros(max(SCRIPT_ID.values()) + 1, dtype=bool)
_LOGO_BY_SID[LOGO_SCRIPT_IDS] = True


def clean_up(text: str) -> str:
    """trim -> lowercase -> drop \\p{N}|\\p{P} -> collapse ASCII \\s+ to ' '."""
    t = _TRIM_RE.sub("", text).lower()
    if not t:
        return ""
    codes = codes_of(t)
    cat = cat_ids(codes)
    keep = (cat != CAT_NUMBER) & (cat != CAT_PUNCT)
    codes = codes[keep]
    if codes.size == 0:
        return ""
    is_ws = _WS_LUT[np.minimum(codes, np.uint32(0x20))] & (codes <= 0x20)
    # collapse runs of ASCII whitespace to a single ' '
    codes = np.where(is_ws, np.uint32(0x20), codes)
    prev_ws = np.concatenate(([False], is_ws[:-1]))
    codes = codes[~(is_ws & prev_ws)]
    return codes.astype("<u4").tobytes().decode("utf-32-le")


def is_logogram_char(codes: np.ndarray) -> np.ndarray:
    """Boolean mask: char is a logogram (CharExtensions.kt:32-39)."""
    return _LOGO_BY_SID[script_ids(codes)]


def word_spans(codes: np.ndarray) -> np.ndarray:
    """(k, 2) [start, end) spans of words in codepoint space."""
    if codes.size == 0:
        return np.empty((0, 2), dtype=np.int64)
    logo = is_logogram_char(codes)
    wc = ~((codes == 0x20) | logo)
    d = np.diff(np.concatenate(([0], wc.view(np.int8), [0])))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    if not logo.any():  # common case: no logograms -> starts are already
        return np.stack([starts, ends], axis=1)  # ascending, nothing to merge
    logos = np.flatnonzero(logo)
    spans = np.concatenate(
        [
            np.stack([starts, ends], axis=1),
            np.stack([logos, logos + 1], axis=1),
        ]
    )
    return spans[np.argsort(spans[:, 0], kind="stable")]


def word_list(text: str) -> list[str]:
    """Split at U+0020 and logograms; logograms become 1-char words."""
    spans = word_spans(codes_of(text))
    return [text[s:e] for s, e in spans]


def has_letter(text: str) -> bool:
    if not text:
        return False
    return bool((cat_ids(codes_of(text)) == 1).any())
