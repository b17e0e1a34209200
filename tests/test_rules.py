"""Model-free rule tests ported from the reference
(`src/test/kotlin/.../api/LanguageDetectorTest.kt:102-563`)."""

import pytest

from lingua_spark import langdata as L
from lingua_spark.core.rules import (
    detect_language_with_rules,
    filter_languages_by_rules,
)
from lingua_spark.core.text import clean_up, word_list, word_spans
from lingua_spark.uniscript import codes_of


def _detect(word: str) -> str:
    codes = codes_of(word)
    return detect_language_with_rules(codes, word_spans(codes))


def _filter(word: str) -> set[str]:
    codes = codes_of(word)
    return set(filter_languages_by_rules(codes, word_spans(codes)))


def test_cleanup_golden():
    # LanguageDetectorTest.kt:102-118
    text = (
        "Weltweit    gibt es ungefähr 6.000 Sprachen,\n"
        "wobei laut Schätzungen zufolge ungefähr 90  Prozent davon\n"
        "am Ende dieses Jahrhunderts verdrängt sein werden."
    )
    assert clean_up(text) == (
        "weltweit gibt es ungefähr sprachen wobei laut schätzungen zufolge "
        "ungefähr prozent davon am ende dieses jahrhunderts verdrängt sein werden"
    )


# LanguageDetectorTest.kt:122-226 (unique characters)
UNIQUE_CHAR_CASES = [
    ("məhərrəm", "AZERBAIJANI"), ("substituïts", "CATALAN"),
    ("rozdělit", "CZECH"), ("tvořen", "CZECH"), ("subjektů", "CZECH"),
    ("nesufiĉecon", "ESPERANTO"), ("intermiksiĝis", "ESPERANTO"),
    ("monaĥinoj", "ESPERANTO"), ("kreitaĵoj", "ESPERANTO"),
    ("ŝpinante", "ESPERANTO"), ("apenaŭ", "ESPERANTO"),
    ("groß", "GERMAN"), ("σχέδια", "GREEK"),
    ("fekvő", "HUNGARIAN"), ("meggyűrűzni", "HUNGARIAN"),
    ("ヴェダイヤモンド", "JAPANESE"),
    ("әлем", "KAZAKH"), ("шаруашылығы", "KAZAKH"), ("ақын", "KAZAKH"),
    ("оның", "KAZAKH"), ("шұрайлы", "KAZAKH"),
    ("teoloģiska", "LATVIAN"), ("blaķene", "LATVIAN"),
    ("ceļojumiem", "LATVIAN"), ("numuriņu", "LATVIAN"),
    ("mergelės", "LITHUANIAN"), ("įrengus", "LITHUANIAN"),
    ("slegiamų", "LITHUANIAN"),
    ("припаѓа", "MACEDONIAN"), ("ѕидови", "MACEDONIAN"),
    ("ќерка", "MACEDONIAN"), ("џамиите", "MACEDONIAN"),
    ("मिळते", "MARATHI"),
    ("үндсэн", "MONGOLIAN"), ("дөхөж", "MONGOLIAN"),
    ("zmieniły", "POLISH"), ("państwowych", "POLISH"),
    ("mniejszości", "POLISH"), ("groźne", "POLISH"),
    ("ialomiţa", "ROMANIAN"),
    ("наслеђивања", "SERBIAN"), ("неисквареношћу", "SERBIAN"),
    ("podĺa", "SLOVAK"), ("pohľade", "SLOVAK"), ("mŕtvych", "SLOVAK"),
    ("ґрунтовому", "UKRAINIAN"), ("пропонує", "UKRAINIAN"),
    ("пристрої", "UKRAINIAN"),
    ("cằm", "VIETNAMESE"), ("thần", "VIETNAMESE"), ("chẳng", "VIETNAMESE"),
    ("quẩy", "VIETNAMESE"), ("sẵn", "VIETNAMESE"), ("nhẫn", "VIETNAMESE"),
    ("dắt", "VIETNAMESE"), ("chất", "VIETNAMESE"), ("đạp", "VIETNAMESE"),
    ("mặn", "VIETNAMESE"), ("hậu", "VIETNAMESE"), ("hiền", "VIETNAMESE"),
    ("lẻn", "VIETNAMESE"), ("biểu", "VIETNAMESE"), ("kẽm", "VIETNAMESE"),
    ("diễm", "VIETNAMESE"), ("phế", "VIETNAMESE"), ("việc", "VIETNAMESE"),
    ("chỉnh", "VIETNAMESE"), ("trĩ", "VIETNAMESE"), ("ravị", "VIETNAMESE"),
    ("thơ", "VIETNAMESE"), ("nguồn", "VIETNAMESE"), ("thờ", "VIETNAMESE"),
    ("sỏi", "VIETNAMESE"), ("tổng", "VIETNAMESE"), ("nhở", "VIETNAMESE"),
    ("mỗi", "VIETNAMESE"), ("bỡi", "VIETNAMESE"), ("tốt", "VIETNAMESE"),
    ("giới", "VIETNAMESE"), ("một", "VIETNAMESE"), ("hợp", "VIETNAMESE"),
    ("hưng", "VIETNAMESE"), ("từng", "VIETNAMESE"), ("của", "VIETNAMESE"),
    ("sử", "VIETNAMESE"), ("cũng", "VIETNAMESE"), ("những", "VIETNAMESE"),
    ("chức", "VIETNAMESE"), ("dụng", "VIETNAMESE"), ("thực", "VIETNAMESE"),
    ("kỳ", "VIETNAMESE"), ("kỷ", "VIETNAMESE"), ("mỹ", "VIETNAMESE"),
    ("mỵ", "VIETNAMESE"),
    ("aṣiwèrè", "YORUBA"), ("ṣaaju", "YORUBA"),
    ("والموضوع", "UNKNOWN"), ("сопротивление", "UNKNOWN"),
    ("house", "UNKNOWN"),
]


@pytest.mark.parametrize("word,expected", UNIQUE_CHAR_CASES)
def test_rule_detection_unique_chars(word, expected):
    assert _detect(word) == expected


# LanguageDetectorTest.kt:229-265 (unique alphabets)
UNIQUE_ALPHABET_CASES = [
    ("ունենա", "ARMENIAN"), ("জানাতে", "BENGALI"), ("გარეუბან", "GEORGIAN"),
    ("σταμάτησε", "GREEK"), ("ઉપકરણોની", "GUJARATI"), ("בתחרויות", "HEBREW"),
    ("びさ", "JAPANESE"), ("대결구도가", "KOREAN"),
    ("ਮੋਟਰਸਾਈਕਲਾਂ", "PUNJABI"), ("துன்பங்களை", "TAMIL"),
    ("కృష్ణదేవరాయలు", "TELUGU"), ("ในทางหลวงหมายเลข", "THAI"),
]


@pytest.mark.parametrize("word,expected", UNIQUE_ALPHABET_CASES)
def test_rule_detection_unique_alphabet(word, expected):
    assert _detect(word) == expected


# LanguageDetectorTest.kt:269-535 (candidate filtering)
FILTER_CASES = [
    ("والموضوع", {"ARABIC", "PERSIAN", "URDU"}),
    ("сопротивление", {"BELARUSIAN", "BULGARIAN", "KAZAKH", "MACEDONIAN",
                       "MONGOLIAN", "RUSSIAN", "SERBIAN", "UKRAINIAN"}),
    ("раскрывае", {"BELARUSIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN"}),
    ("этот", {"BELARUSIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN"}),
    ("огнём", {"BELARUSIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN"}),
    ("плаваща", {"BULGARIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN", "UKRAINIAN"}),
    ("довършат", {"BULGARIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN"}),
    ("павінен", {"BELARUSIAN", "KAZAKH", "UKRAINIAN"}),
    ("затоплување", {"MACEDONIAN", "SERBIAN"}),
    ("ректасцензија", {"MACEDONIAN", "SERBIAN"}),
    ("набљудувач", {"MACEDONIAN", "SERBIAN"}),
    ("aizklātā", {"LATVIAN", "MAORI", "YORUBA"}),
    ("sistēmas", {"LATVIAN", "MAORI", "YORUBA"}),
    ("palīdzi", {"LATVIAN", "MAORI", "YORUBA"}),
    ("nhẹn", {"VIETNAMESE", "YORUBA"}),
    ("chọn", {"VIETNAMESE", "YORUBA"}),
    ("prihvaćanju", {"BOSNIAN", "CROATIAN", "POLISH"}),
    ("nađete", {"BOSNIAN", "CROATIAN", "VIETNAMESE"}),
    ("visão", {"PORTUGUESE", "VIETNAMESE"}),
    ("wystąpią", {"LITHUANIAN", "POLISH"}),
    ("budowę", {"LITHUANIAN", "POLISH"}),
    ("nebūsime", {"LATVIAN", "LITHUANIAN", "MAORI", "YORUBA"}),
    ("afişate", {"AZERBAIJANI", "ROMANIAN", "TURKISH"}),
    ("kradzieżami", {"POLISH", "ROMANIAN"}),
    ("înviat", {"FRENCH", "ROMANIAN"}),
    ("venerdì", {"ITALIAN", "VIETNAMESE", "YORUBA"}),
    ("años", {"BASQUE", "SPANISH"}),
    ("rozohňuje", {"CZECH", "SLOVAK"}),
    ("rtuť", {"CZECH", "SLOVAK"}),
    ("pregătire", {"ROMANIAN", "VIETNAMESE"}),
    ("jeďte", {"CZECH", "ROMANIAN", "SLOVAK"}),
    ("minjaverðir", {"ICELANDIC", "TURKISH"}),
    ("þagnarskyldu", {"ICELANDIC", "TURKISH"}),
    ("nebûtu", {"FRENCH", "HUNGARIAN"}),
    ("hashemidëve", {"AFRIKAANS", "ALBANIAN", "DUTCH", "FRENCH"}),
    ("forêt", {"AFRIKAANS", "FRENCH", "PORTUGUESE", "VIETNAMESE"}),
    ("succèdent", {"FRENCH", "ITALIAN", "VIETNAMESE", "YORUBA"}),
    ("où", {"FRENCH", "ITALIAN", "VIETNAMESE", "YORUBA"}),
    ("tõeliseks", {"ESTONIAN", "HUNGARIAN", "PORTUGUESE", "VIETNAMESE"}),
    ("viòiem", {"CATALAN", "ITALIAN", "VIETNAMESE", "YORUBA"}),
    ("contrôle", {"FRENCH", "PORTUGUESE", "SLOVAK", "VIETNAMESE"}),
    ("direktør", {"BOKMAL", "DANISH", "NYNORSK"}),
    ("vývoj", {"CZECH", "ICELANDIC", "SLOVAK", "TURKISH", "VIETNAMESE"}),
    ("päralt", {"ESTONIAN", "FINNISH", "GERMAN", "SLOVAK", "SWEDISH"}),
    ("labâk", {"FRENCH", "PORTUGUESE", "ROMANIAN", "TURKISH", "VIETNAMESE"}),
    ("pràctiques", {"CATALAN", "FRENCH", "ITALIAN", "PORTUGUESE",
                    "VIETNAMESE"}),
    ("überrascht", {"AZERBAIJANI", "CATALAN", "ESTONIAN", "GERMAN",
                    "HUNGARIAN", "SPANISH", "TURKISH"}),
    ("indebærer", {"BOKMAL", "DANISH", "ICELANDIC", "NYNORSK"}),
    ("måned", {"BOKMAL", "DANISH", "NYNORSK", "SWEDISH"}),
    ("zaručen", {"BOSNIAN", "CZECH", "CROATIAN", "LATVIAN", "LITHUANIAN",
                 "SLOVAK", "SLOVENE"}),
    ("zkouškou", {"BOSNIAN", "CZECH", "CROATIAN", "LATVIAN", "LITHUANIAN",
                  "SLOVAK", "SLOVENE"}),
    ("navržen", {"BOSNIAN", "CZECH", "CROATIAN", "LATVIAN", "LITHUANIAN",
                 "SLOVAK", "SLOVENE"}),
    ("façonnage", {"ALBANIAN", "AZERBAIJANI", "BASQUE", "CATALAN", "FRENCH",
                   "PORTUGUESE", "TURKISH"}),
    ("höher", {"AZERBAIJANI", "ESTONIAN", "FINNISH", "GERMAN", "HUNGARIAN",
               "ICELANDIC", "SWEDISH", "TURKISH"}),
    ("catedráticos", {"CATALAN", "CZECH", "ICELANDIC", "IRISH", "HUNGARIAN",
                      "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE",
                      "YORUBA"}),
    ("política", {"CATALAN", "CZECH", "ICELANDIC", "IRISH", "HUNGARIAN",
                  "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE", "YORUBA"}),
    ("música", {"CATALAN", "CZECH", "ICELANDIC", "IRISH", "HUNGARIAN",
                "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE", "YORUBA"}),
    ("contradicció", {"CATALAN", "HUNGARIAN", "ICELANDIC", "IRISH", "POLISH",
                      "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE",
                      "YORUBA"}),
    ("només", {"CATALAN", "CZECH", "FRENCH", "HUNGARIAN", "ICELANDIC",
               "IRISH", "ITALIAN", "PORTUGUESE", "SLOVAK", "SPANISH",
               "VIETNAMESE", "YORUBA"}),
]


@pytest.mark.parametrize("word,expected", FILTER_CASES)
def test_rule_filtering(word, expected):
    assert _filter(word) == expected


def test_rule_filtering_plain_latin_word_keeps_all_latin_languages():
    # "house" case (LanguageDetectorTest.kt:507-535): all Latin-script langs.
    latin = {l.name for l in L.LANGUAGES if "LATIN" in l.scripts}
    assert _filter("house") == latin


def test_word_list():
    # WordListTest.kt behavior: split at single spaces + logograms
    assert word_list("this is a sentence") == ["this", "is", "a", "sentence"]
    assert word_list("sentence  with  multiple  spaces") == [
        "sentence", "with", "multiple", "spaces",
    ]
    assert word_list("日本語です") == ["日", "本", "語", "で", "す"]
    assert word_list("mixed 日本 words") == ["mixed", "日", "本", "words"]


NO_LETTER_STRINGS = ["", " \n  \t;", "3<856%)§"]


@pytest.mark.parametrize("s", NO_LETTER_STRINGS)
def test_no_letters_returns_unknown(s, packed_models):
    from lingua_spark.core.detector import Detector

    det = Detector(models=packed_models)
    assert det.detect(s) == "UNKNOWN"
    assert det.confidence_values(s) == []


def test_no_ngram_probabilities_returns_unknown(packed_models):
    # LanguageDetectorTest.kt:539-563: Cyrillic word, en/de-only detector
    from lingua_spark.core.detector import Detector

    det = Detector(models=packed_models, languages=("ENGLISH", "GERMAN"))
    assert det.detect("проарплап") == "UNKNOWN"
    assert det.confidence_values("проарплап") == []


def test_builder_validation(packed_models):
    from lingua_spark.core.detector import Detector

    with pytest.raises(ValueError):
        Detector(models=packed_models, minimum_relative_distance=1.5)
    with pytest.raises(ValueError):
        Detector(models=packed_models, languages=())


def test_detection_is_deterministic(packed_models):
    # LanguageDetectorTest.kt:579-604
    from lingua_spark.core.detector import Detector

    det = Detector(models=packed_models)
    results = {det.detect("das ist ein deutscher satz") for _ in range(25)}
    assert len(results) == 1


def test_filter_chars_to_languages_vectorized_matches_reference_loop():
    """The vectorized (word, group) expansion in filter_languages_mask must
    equal the reference's per-word loop (LanguageDetector.kt:518-535: each
    language at most once per word, only filtered candidates count) on
    texts dense in mapped characters."""
    import numpy as np

    from lingua_spark.core import rules as R
    from lingua_spark.core.text import word_spans

    mapped = sorted(L.CHARS_TO_LANGUAGES)
    rng = np.random.default_rng(7)

    def reference_counts(codes, spans, filtered_mask):
        c2l_table, c2l_groups = R._chars_to_languages_table()
        gids_all = c2l_table[np.minimum(codes, R._MAX_CP - 1)]
        has_gid = gids_all >= 0
        lang_counts = np.zeros(L.N_LANGUAGES, dtype=np.int64)
        for s, e in spans:
            w = gids_all[s:e]
            w = w[has_gid[s:e]]
            if w.size == 0:
                continue
            seen = np.zeros(L.N_LANGUAGES, dtype=bool)
            for gid in w:
                ords = c2l_groups[gid]
                sel = ords[filtered_mask[ords] & ~seen[ords]]
                seen[sel] = True
            lang_counts[seen] += 1
        return lang_counts

    for trial in range(50):
        words = []
        for _ in range(int(rng.integers(1, 8))):
            chars = [
                "abcdefgh"[int(rng.integers(0, 8))]
                if rng.random() < 0.5
                else mapped[int(rng.integers(0, len(mapped)))]
                for _ in range(int(rng.integers(1, 7)))
            ]
            words.append("".join(chars))
        text = " ".join(words)
        codes = codes_of(text)
        spans = word_spans(codes)
        got = R.filter_languages_mask(codes, spans)
        # recompute what the mask would be with the reference loop's counts
        det_mask, script_langs = R._lang_masks(
            frozenset(n for n in (l.name for l in L.LANGUAGES))
        )
        # reproduce phase 1 to get filtered_mask + adjusted word count
        sids_all = R.script_ids(codes)
        starts, ends = spans[:, 0], spans[:, 1]
        mark = np.zeros(codes.size + 1, dtype=np.int8)
        mark[starts] += 1
        mark[ends] -= 1
        pos = np.flatnonzero(np.cumsum(mark[:-1]) > 0)
        wid = np.searchsorted(starts, pos, side="right") - 1
        packed = sids_all[pos]
        offsets = np.searchsorted(wid, np.arange(spans.shape[0] + 1))
        wmin = np.minimum.reduceat(packed, offsets[:-1])
        wmax = np.maximum.reduceat(packed, offsets[:-1])
        sid0 = packed[offsets[:-1]]
        const = (wmin == wmax) & (sid0 != R._OTHER)
        word_value = np.full(spans.shape[0], L.FULL_WORD_VALUE)
        votes = np.zeros(R.N_SCRIPTS, dtype=np.float64)
        np.add.at(votes, sid0[const], word_value[const])
        adjusted = float(word_value.sum())
        if not votes.any():
            # mixed-script words cast no alphabet vote -> early det_mask copy
            assert (got == det_mask).all(), f"trial {trial}: {text!r}"
            continue
        frequent = (votes > 0) & (votes / votes.max() >= L.CLOSE_ALPHABET_RATIO)
        filtered_mask = det_mask & script_langs[frequent].any(axis=0)
        counts = reference_counts(codes, spans, filtered_mask)
        subset = filtered_mask & (counts >= adjusted / 2.0)
        want = subset if subset.any() else filtered_mask
        assert (got == want).all(), f"trial {trial}: {text!r}"
