"""Language universe: the reference's 79 detectable languages + UNKNOWN.

Metadata extracted (as data, not code) from the reference enum
`/root/reference/src/main/kotlin/com/github/pemistahl/lingua/api/Language.kt:186-289`
and `internal/Constant.kt:73-140`. Ordinals follow the reference's enum
declaration order because confidence ties are broken by declaration order
(`internal/util/EnumDoubleMap.kt:97-128`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# (NAME, iso639_1, iso639_3, scripts, unique_characters)
_LANG_ROWS: list[tuple[str, str, str, tuple[str, ...], str]] = [
    ("AFRIKAANS", "af", "afr", ("LATIN",), ""),
    ("ALBANIAN", "sq", "sqi", ("LATIN",), ""),
    ("AMHARIC", "am", "amh", ("ETHIOPIC",), ""),
    ("ARABIC", "ar", "ara", ("ARABIC",), ""),
    ("ARMENIAN", "hy", "hye", ("ARMENIAN",), ""),
    ("AZERBAIJANI", "az", "aze", ("LATIN",), "Əə"),
    ("BASQUE", "eu", "eus", ("LATIN",), ""),
    ("BELARUSIAN", "be", "bel", ("CYRILLIC",), ""),
    ("BENGALI", "bn", "ben", ("BENGALI",), ""),
    ("BOKMAL", "nb", "nob", ("LATIN",), ""),
    ("BOSNIAN", "bs", "bos", ("LATIN",), ""),
    ("BULGARIAN", "bg", "bul", ("CYRILLIC",), ""),
    ("CATALAN", "ca", "cat", ("LATIN",), "Ïï"),
    ("CHINESE", "zh", "zho", ("HAN",), ""),
    ("CROATIAN", "hr", "hrv", ("LATIN",), ""),
    ("CZECH", "cs", "ces", ("LATIN",), "ĚěŘřŮů"),
    ("DANISH", "da", "dan", ("LATIN",), ""),
    ("DUTCH", "nl", "nld", ("LATIN",), ""),
    ("ENGLISH", "en", "eng", ("LATIN",), ""),
    ("ESPERANTO", "eo", "epo", ("LATIN",), "ĈĉĜĝĤĥĴĵŜŝŬŭ"),
    ("ESTONIAN", "et", "est", ("LATIN",), ""),
    ("FINNISH", "fi", "fin", ("LATIN",), ""),
    ("FRENCH", "fr", "fra", ("LATIN",), ""),
    ("GANDA", "lg", "lug", ("LATIN",), ""),
    ("GEORGIAN", "ka", "kat", ("GEORGIAN",), ""),
    ("GERMAN", "de", "deu", ("LATIN",), "ß"),
    ("GREEK", "el", "ell", ("GREEK",), ""),
    ("GUJARATI", "gu", "guj", ("GUJARATI",), ""),
    ("HEBREW", "he", "heb", ("HEBREW",), ""),
    ("HINDI", "hi", "hin", ("DEVANAGARI",), ""),
    ("HUNGARIAN", "hu", "hun", ("LATIN",), "ŐőŰű"),
    ("ICELANDIC", "is", "isl", ("LATIN",), ""),
    ("INDONESIAN", "id", "ind", ("LATIN",), ""),
    ("IRISH", "ga", "gle", ("LATIN",), ""),
    ("ITALIAN", "it", "ita", ("LATIN",), ""),
    ("JAPANESE", "ja", "jpn", ("HIRAGANA", "KATAKANA", "HAN"), ""),
    ("KAZAKH", "kk", "kaz", ("CYRILLIC",), "ӘәҒғҚқҢңҰұ"),
    ("KOREAN", "ko", "kor", ("HANGUL",), ""),
    ("LATIN", "la", "lat", ("LATIN",), ""),
    ("LATVIAN", "lv", "lav", ("LATIN",), "ĢģĶķĻļŅņ"),
    ("LITHUANIAN", "lt", "lit", ("LATIN",), "ĖėĮįŲų"),
    ("MACEDONIAN", "mk", "mkd", ("CYRILLIC",), "ЃѓЅѕЌќЏџ"),
    ("MALAY", "ms", "msa", ("LATIN",), ""),
    ("MAORI", "mi", "mri", ("LATIN",), ""),
    ("MARATHI", "mr", "mar", ("DEVANAGARI",), "ळ"),
    ("MONGOLIAN", "mn", "mon", ("CYRILLIC",), "ӨөҮү"),
    ("NYNORSK", "nn", "nno", ("LATIN",), ""),
    ("OROMO", "om", "orm", ("LATIN",), ""),
    ("PERSIAN", "fa", "fas", ("ARABIC",), ""),
    ("POLISH", "pl", "pol", ("LATIN",), "ŁłŃńŚśŹź"),
    ("PORTUGUESE", "pt", "por", ("LATIN",), ""),
    ("PUNJABI", "pa", "pan", ("GURMUKHI",), ""),
    ("ROMANIAN", "ro", "ron", ("LATIN",), "Țţ"),
    ("RUSSIAN", "ru", "rus", ("CYRILLIC",), ""),
    ("SERBIAN", "sr", "srp", ("CYRILLIC",), "ЂђЋћ"),
    ("SHONA", "sn", "sna", ("LATIN",), ""),
    ("SINHALA", "si", "sin", ("SINHALA",), ""),
    ("SLOVAK", "sk", "slk", ("LATIN",), "ĹĺĽľŔŕ"),
    ("SLOVENE", "sl", "slv", ("LATIN",), ""),
    ("SOMALI", "so", "som", ("LATIN",), ""),
    ("SOTHO", "st", "sot", ("LATIN",), ""),
    ("SPANISH", "es", "spa", ("LATIN",), "¿¡"),
    ("SWAHILI", "sw", "swa", ("LATIN",), ""),
    ("SWEDISH", "sv", "swe", ("LATIN",), ""),
    ("TAGALOG", "tl", "tgl", ("LATIN",), ""),
    ("TAMIL", "ta", "tam", ("TAMIL",), ""),
    ("TELUGU", "te", "tel", ("TELUGU",), ""),
    ("THAI", "th", "tha", ("THAI",), ""),
    ("TIGRINYA", "ti", "tir", ("ETHIOPIC",), ""),
    ("TSONGA", "ts", "tso", ("LATIN",), ""),
    ("TSWANA", "tn", "tsn", ("LATIN",), ""),
    ("TURKISH", "tr", "tur", ("LATIN",), ""),
    ("UKRAINIAN", "uk", "ukr", ("CYRILLIC",), "ҐґЄєЇї"),
    ("URDU", "ur", "urd", ("ARABIC",), ""),
    (
        "VIETNAMESE", "vi", "vie", ("LATIN",),
        "ẰằẦầẲẳẨẩẴẵẪẫẮắẤấẠạẶặẬậỀềẺẻỂểẼẽỄễẾếỆệỈỉĨĩỊịƠơỒồỜờỎỏỔổỞởỖỗỠỡỐốỚớỘộỢợ"
        "ƯưỪừỦủỬửŨũỮữỨứỤụỰựỲỳỶỷỸỹỴỵ",
    ),
    ("WELSH", "cy", "cym", ("LATIN",), ""),
    ("XHOSA", "xh", "xho", ("LATIN",), ""),
    ("YORUBA", "yo", "yor", ("LATIN",), "Ṣṣ"),
    ("ZULU", "zu", "zul", ("LATIN",), ""),
]

UNKNOWN = "UNKNOWN"


@dataclass(frozen=True)
class Lang:
    name: str
    ordinal: int
    iso1: str
    iso3: str
    scripts: tuple[str, ...]
    unique_chars: str = ""
    unique_set: frozenset[str] = field(default_factory=frozenset)


LANGUAGES: list[Lang] = [
    Lang(name, i, iso1, iso3, scripts, uniq, frozenset(uniq))
    for i, (name, iso1, iso3, scripts, uniq) in enumerate(_LANG_ROWS)
]
N_LANGUAGES = len(LANGUAGES)  # 79 concrete languages (UNKNOWN excluded)

BY_NAME: dict[str, Lang] = {l.name: l for l in LANGUAGES}
BY_ISO1: dict[str, Lang] = {l.iso1: l for l in LANGUAGES}
ORDINAL: dict[str, int] = {l.name: l.ordinal for l in LANGUAGES}
ISO1 = [l.iso1 for l in LANGUAGES]

# Languages whose words are logograms (Language.kt via Constant.kt:158-159).
LANGUAGES_SUPPORTING_LOGOGRAMS = frozenset({"CHINESE", "JAPANESE", "KOREAN"})
# Scripts of those languages — chars of these scripts are logograms
# (CharExtensions.kt:25-39).
SCRIPTS_WITH_LOGOGRAMS = frozenset({"HAN", "HIRAGANA", "KATAKANA", "HANGUL"})

# Scripts claimed by exactly one language, computed with the reference's
# add-on-first/remove-on-second algorithm (Language.kt:316-335).
def _scripts_supporting_exactly_one_language() -> dict[str, str]:
    encountered: set[str] = set()
    out: dict[str, str] = {}
    for lang in LANGUAGES:
        for s in lang.scripts:
            if s not in encountered:
                encountered.add(s)
                out[s] = lang.name
            else:
                out.pop(s, None)
    return out


SCRIPTS_SUPPORTING_EXACTLY_ONE_LANGUAGE: dict[str, str] = (
    _scripts_supporting_exactly_one_language()
)

# All scripts used by any language (Language.kt:309-314).
ALL_SCRIPTS: list[str] = sorted({s for l in LANGUAGES for s in l.scripts})

LANGUAGES_WITH_UNIQUE_CHARS: list[Lang] = [l for l in LANGUAGES if l.unique_chars]

# Characters shared by a closed set of languages (Constant.kt:73-140).
_CHARS_TO_LANGS_ROWS: list[tuple[str, tuple[str, ...]]] = [
    ("Ãã", ("PORTUGUESE", "VIETNAMESE")),
    ("ĄąĘę", ("LITHUANIAN", "POLISH")),
    ("Żż", ("POLISH", "ROMANIAN")),
    ("Îî", ("FRENCH", "ROMANIAN")),
    ("Ññ", ("BASQUE", "SPANISH")),
    ("ŇňŤť", ("CZECH", "SLOVAK")),
    ("Ăă", ("ROMANIAN", "VIETNAMESE")),
    ("İıĞğ", ("AZERBAIJANI", "TURKISH")),
    ("ЈјЉљЊњ", ("MACEDONIAN", "SERBIAN")),
    ("ẸẹỌọ", ("VIETNAMESE", "YORUBA")),
    ("ÐðÞþ", ("ICELANDIC", "TURKISH")),
    ("Ûû", ("FRENCH", "HUNGARIAN")),
    ("Ōō", ("MAORI", "YORUBA")),
    ("ĀāĒēĪī", ("LATVIAN", "MAORI", "YORUBA")),
    ("Şş", ("AZERBAIJANI", "ROMANIAN", "TURKISH")),
    ("Ďď", ("CZECH", "ROMANIAN", "SLOVAK")),
    ("Ćć", ("BOSNIAN", "CROATIAN", "POLISH")),
    ("Đđ", ("BOSNIAN", "CROATIAN", "VIETNAMESE")),
    ("Іі", ("BELARUSIAN", "KAZAKH", "UKRAINIAN")),
    ("Ìì", ("ITALIAN", "VIETNAMESE", "YORUBA")),
    ("Øø", ("BOKMAL", "DANISH", "NYNORSK")),
    ("Ūū", ("LATVIAN", "LITHUANIAN", "MAORI", "YORUBA")),
    ("Ëë", ("AFRIKAANS", "ALBANIAN", "DUTCH", "FRENCH")),
    ("ÈèÙù", ("FRENCH", "ITALIAN", "VIETNAMESE", "YORUBA")),
    ("Êê", ("AFRIKAANS", "FRENCH", "PORTUGUESE", "VIETNAMESE")),
    ("Õõ", ("ESTONIAN", "HUNGARIAN", "PORTUGUESE", "VIETNAMESE")),
    ("Ôô", ("FRENCH", "PORTUGUESE", "SLOVAK", "VIETNAMESE")),
    ("ЁёЫыЭэ", ("BELARUSIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN")),
    ("Щщ", ("BULGARIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN", "UKRAINIAN")),
    ("Ъъ", ("BULGARIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN")),
    ("Òò", ("CATALAN", "ITALIAN", "VIETNAMESE", "YORUBA")),
    ("Ææ", ("BOKMAL", "DANISH", "ICELANDIC", "NYNORSK")),
    ("Åå", ("BOKMAL", "DANISH", "NYNORSK", "SWEDISH")),
    ("Ýý", ("CZECH", "ICELANDIC", "SLOVAK", "TURKISH", "VIETNAMESE")),
    ("Ää", ("ESTONIAN", "FINNISH", "GERMAN", "SLOVAK", "SWEDISH")),
    ("Àà", ("CATALAN", "FRENCH", "ITALIAN", "PORTUGUESE", "VIETNAMESE")),
    ("Ââ", ("FRENCH", "PORTUGUESE", "ROMANIAN", "TURKISH", "VIETNAMESE")),
    ("Üü", ("AZERBAIJANI", "CATALAN", "ESTONIAN", "GERMAN", "HUNGARIAN",
            "SPANISH", "TURKISH")),
    ("ČčŠšŽž", ("BOSNIAN", "CZECH", "CROATIAN", "LATVIAN", "LITHUANIAN",
                "SLOVAK", "SLOVENE")),
    ("Çç", ("ALBANIAN", "AZERBAIJANI", "BASQUE", "CATALAN", "FRENCH",
            "PORTUGUESE", "TURKISH")),
    ("Öö", ("AZERBAIJANI", "ESTONIAN", "FINNISH", "GERMAN", "HUNGARIAN",
            "ICELANDIC", "SWEDISH", "TURKISH")),
    ("Óó", ("CATALAN", "HUNGARIAN", "ICELANDIC", "IRISH", "POLISH",
            "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE", "YORUBA")),
    ("ÁáÍíÚú", ("CATALAN", "CZECH", "ICELANDIC", "IRISH", "HUNGARIAN",
                "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE", "YORUBA")),
    ("Éé", ("CATALAN", "CZECH", "FRENCH", "HUNGARIAN", "ICELANDIC", "IRISH",
            "ITALIAN", "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE",
            "YORUBA")),
]

CHARS_TO_LANGUAGES: dict[str, tuple[str, ...]] = {}
for _chars, _langs in _CHARS_TO_LANGS_ROWS:
    for _ch in _chars:
        CHARS_TO_LANGUAGES[_ch] = _langs

FULL_WORD_VALUE = 1.0
LOGOGRAM_WORD_VALUE = 0.7  # LanguageDetector.kt:66
LOGOGRAM_PROBABILITY_BOOST = 0.85  # LanguageDetector.kt:583
UNKNOWN_WORD_FRACTION_CUT = 0.4  # LanguageDetector.kt:445
CLOSE_WORD_COUNT_RATIO = 0.8  # LanguageDetector.kt:470
CLOSE_ALPHABET_RATIO = 0.8  # LanguageDetector.kt:506
HIGH_ACCURACY_MODE_MAX_TEXT_LENGTH = 120  # LanguageDetector.kt:755
