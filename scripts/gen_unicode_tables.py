"""Generate vendored Unicode lookup tables for lingua_spark.

Produces ``lingua_spark/data/unicode_tables.npz`` with two uint8 arrays
indexed by codepoint (0 .. MAX_CODEPOINT):

- ``script``: script id (see SCRIPT_RANGES below; 0 = OTHER/unsupported)
- ``cat``: coarse character class derived from ``unicodedata``:
    0 other, 1 letter (category L*), 2 number (N*), 3 punctuation (P*),
    4 whitespace (str.isspace()).

Script ranges are the principal ranges from the public Unicode
``Scripts.txt`` data file for the 20 scripts used by the reference's
language universe (`/root/reference/.../api/Language.kt:186-289`).
Both the pure-Python oracle and the Spark engine consume the same
tables, so parity is by construction.

Run once; output is committed. Deterministic (depends only on the
Python build's unicodedata version, pinned by the container).
"""

from __future__ import annotations

import sys
import unicodedata
from pathlib import Path

import numpy as np

MAX_CODEPOINT = 0x30000  # covers all scripts we classify; above -> OTHER/non-letter

# script name -> id (0 reserved for OTHER). Order is stable and arbitrary;
# rule outcomes never depend on script id order (see SURVEY.md §2 F1/F2 notes).
SCRIPTS = [
    "LATIN", "CYRILLIC", "GREEK", "ARABIC", "HEBREW", "ARMENIAN", "GEORGIAN",
    "DEVANAGARI", "BENGALI", "GURMUKHI", "GUJARATI", "TAMIL", "TELUGU",
    "SINHALA", "THAI", "ETHIOPIC", "HAN", "HIRAGANA", "KATAKANA", "HANGUL",
]
SCRIPT_ID = {name: i + 1 for i, name in enumerate(SCRIPTS)}

# Principal codepoint ranges per script (inclusive), from public Unicode
# Scripts.txt. Intentionally excludes COMMON/INHERITED codepoints that sit
# inside the blocks (e.g. U+30FC prolonged sound mark, U+0E3F baht sign,
# Arabic combining marks U+064B..U+0655, tatweel U+0640).
SCRIPT_RANGES: dict[str, list[tuple[int, int]]] = {
    "LATIN": [
        (0x0041, 0x005A), (0x0061, 0x007A), (0x00AA, 0x00AA), (0x00BA, 0x00BA),
        (0x00C0, 0x00D6), (0x00D8, 0x00F6), (0x00F8, 0x02B8), (0x02E0, 0x02E4),
        (0x1D00, 0x1D25), (0x1D2C, 0x1D5C), (0x1D62, 0x1D65), (0x1D6B, 0x1D77),
        (0x1D79, 0x1DBE), (0x1E00, 0x1EFF), (0x2071, 0x2071), (0x207F, 0x207F),
        (0x2090, 0x209C), (0x212A, 0x212B), (0x2132, 0x2132), (0x214E, 0x214E),
        (0x2160, 0x2188), (0x2C60, 0x2C7F), (0xA722, 0xA787), (0xA78B, 0xA7CA),
        (0xAB30, 0xAB5A), (0xAB5C, 0xAB64), (0xFB00, 0xFB06),
        (0xFF21, 0xFF3A), (0xFF41, 0xFF5A),
    ],
    "CYRILLIC": [
        (0x0400, 0x0484), (0x0487, 0x052F), (0x1C80, 0x1C88), (0x1D2B, 0x1D2B),
        (0x1D78, 0x1D78), (0x2DE0, 0x2DFF), (0xA640, 0xA69F),
    ],
    "GREEK": [
        (0x0370, 0x0373), (0x0375, 0x0377), (0x037A, 0x037D), (0x037F, 0x037F),
        (0x0384, 0x0384), (0x0386, 0x0386), (0x0388, 0x038A), (0x038C, 0x038C),
        (0x038E, 0x03A1), (0x03A3, 0x03E1), (0x03F0, 0x03FF), (0x1D26, 0x1D2A),
        (0x1D5D, 0x1D61), (0x1D66, 0x1D6A), (0x1DBF, 0x1DBF), (0x1F00, 0x1F15),
        (0x1F18, 0x1F1D), (0x1F20, 0x1F45), (0x1F48, 0x1F4D), (0x1F50, 0x1F57),
        (0x1F59, 0x1F59), (0x1F5B, 0x1F5B), (0x1F5D, 0x1F5D), (0x1F5F, 0x1F7D),
        (0x1F80, 0x1FB4), (0x1FB6, 0x1FC4), (0x1FC6, 0x1FD3), (0x1FD6, 0x1FDB),
        (0x1FDD, 0x1FEF), (0x1FF2, 0x1FF4), (0x1FF6, 0x1FFE), (0x2126, 0x2126),
    ],
    "ARABIC": [
        (0x0600, 0x0604), (0x0606, 0x060B), (0x060D, 0x061A), (0x061C, 0x061E),
        (0x0620, 0x063F), (0x0641, 0x064A), (0x0656, 0x066F), (0x0671, 0x06DC),
        (0x06DE, 0x06FF), (0x0750, 0x077F), (0x08A0, 0x08B4), (0x08B6, 0x08BD),
        (0xFB50, 0xFBC1), (0xFDF0, 0xFDFD), (0xFE70, 0xFE74), (0xFE76, 0xFEFC),
    ],
    "HEBREW": [(0x0591, 0x05C7), (0x05D0, 0x05EA), (0x05EF, 0x05F4), (0xFB1D, 0xFB4F)],
    "ARMENIAN": [(0x0531, 0x0556), (0x0559, 0x058A), (0x058D, 0x058F), (0xFB13, 0xFB17)],
    "GEORGIAN": [(0x10A0, 0x10C5), (0x10C7, 0x10C7), (0x10CD, 0x10CD), (0x10D0, 0x10FA),
                 (0x10FC, 0x10FF), (0x1C90, 0x1CBA), (0x1CBD, 0x1CBF), (0x2D00, 0x2D25)],
    "DEVANAGARI": [(0x0900, 0x0950), (0x0953, 0x0963), (0x0966, 0x097F), (0xA8E0, 0xA8FF)],
    "BENGALI": [(0x0980, 0x09FF)],
    "GURMUKHI": [(0x0A01, 0x0A75)],
    "GUJARATI": [(0x0A81, 0x0AFF)],
    "TAMIL": [(0x0B82, 0x0BFA)],
    "TELUGU": [(0x0C00, 0x0C7F)],
    "SINHALA": [(0x0D81, 0x0DF4)],
    "THAI": [(0x0E01, 0x0E3A), (0x0E40, 0x0E5B)],
    "ETHIOPIC": [(0x1200, 0x137C), (0x1380, 0x1399), (0x2D80, 0x2DDE), (0xAB01, 0xAB2E)],
    "HAN": [
        (0x2E80, 0x2EF3), (0x2F00, 0x2FD5), (0x3005, 0x3005), (0x3007, 0x3007),
        (0x3021, 0x3029), (0x3038, 0x303B), (0x3400, 0x4DBF), (0x4E00, 0x9FFF),
        (0xF900, 0xFA6D), (0xFA70, 0xFAD9), (0x20000, 0x2A6DF), (0x2A700, 0x2EBE0),
        (0x2F800, 0x2FA1D),
    ],
    "HIRAGANA": [(0x3041, 0x3096), (0x309D, 0x309F)],
    "KATAKANA": [
        (0x30A1, 0x30FA), (0x30FD, 0x30FF), (0x31F0, 0x31FF), (0x32D0, 0x32FE),
        (0xFF66, 0xFF6F), (0xFF71, 0xFF9D),
    ],
    "HANGUL": [
        (0x1100, 0x11FF), (0x3131, 0x318E), (0xA960, 0xA97C), (0xAC00, 0xD7A3),
        (0xD7B0, 0xD7C6), (0xD7CB, 0xD7FB), (0xFFA0, 0xFFBE), (0xFFC2, 0xFFC7),
        (0xFFCA, 0xFFCF), (0xFFD2, 0xFFD7), (0xFFDA, 0xFFDC),
    ],
}


def build() -> tuple[np.ndarray, np.ndarray]:
    script = np.zeros(MAX_CODEPOINT, dtype=np.uint8)
    for name, ranges in SCRIPT_RANGES.items():
        sid = SCRIPT_ID[name]
        for lo, hi in ranges:
            if lo < MAX_CODEPOINT:
                script[lo : min(hi + 1, MAX_CODEPOINT)] = sid

    cat = np.zeros(MAX_CODEPOINT, dtype=np.uint8)
    for cp in range(MAX_CODEPOINT):
        ch = chr(cp)
        c = unicodedata.category(ch)
        if c[0] == "L":
            cat[cp] = 1
        elif c[0] == "N":
            cat[cp] = 2
        elif c[0] == "P":
            cat[cp] = 3
        elif ch.isspace():
            cat[cp] = 4
    return script, cat


if __name__ == "__main__":
    out = Path(__file__).resolve().parent.parent / "lingua_spark" / "data" / "unicode_tables.npz"
    script, cat = build()
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, script=script, cat=cat)
    print(f"wrote {out} ({out.stat().st_size} bytes)", file=sys.stderr)
