"""Property-based parity: for ARBITRARY unicode text, the three
implementations (per-row engine, cross-row batch engine, dict oracle)
must agree bit-for-bit, and the quality assessment must be total (no
exceptions, keep/drop defined) — the fuzz extension of the fixed-corpus
parity suite (SURVEY.md §5)."""

import numpy as np
from hypothesis import given, settings, strategies as st

# mixed alphabets + punctuation + digits + whitespace + astral chars
_TEXT = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),      # ASCII
        st.characters(min_codepoint=0xC0, max_codepoint=0x24F),     # Latin ext
        st.characters(min_codepoint=0x400, max_codepoint=0x4FF),    # Cyrillic
        st.characters(min_codepoint=0x370, max_codepoint=0x3FF),    # Greek
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4FFF),  # Han
        st.characters(min_codepoint=0x3040, max_codepoint=0x30FF),  # Kana
        st.characters(min_codepoint=0x600, max_codepoint=0x6FF),    # Arabic
        st.characters(min_codepoint=0x900, max_codepoint=0x97F),    # Devanagari
        st.characters(min_codepoint=0x1F300, max_codepoint=0x1F5FF),  # emoji
        st.sampled_from(" \t\n.,;:!?'\"-–—()[]0123456789"),
    ),
    max_size=60,
)


@settings(max_examples=120, deadline=None)
@given(texts=st.lists(_TEXT, min_size=1, max_size=6))
def test_three_way_confidence_parity(packed_models, oracle_tables, texts):
    from lingua_spark.core.detector import Detector
    from lingua_spark.engine.batch import BatchDetector
    from lingua_spark.oracle import OracleDetector

    det = Detector(models=packed_models)
    bdet = BatchDetector(models=packed_models)
    ora = OracleDetector(tables=oracle_tables)
    batch = bdet.confidence_rows(texts)
    for i, t in enumerate(texts):
        per_row = det.confidence_values(t)
        assert per_row == batch[i], repr(t)
        assert per_row == ora.confidence_values(t), repr(t)
        assert det.detect(t) == bdet.decide_rows([batch[i]])[0] == ora.detect(t)


@settings(max_examples=60, deadline=None)
@given(text=_TEXT)
def test_assessment_total_and_consistent(packed_models, ft_model, text):
    """assess_text never raises on arbitrary input, produces a defined
    keep/drop, a scrubbed text, and per-row == batch output."""
    from lingua_spark.core.detector import Detector
    from lingua_spark.engine.batch import BatchDetector
    from lingua_spark.quality import QualityConfig, assess_batch, assess_text

    cfg = QualityConfig()
    det = Detector(models=packed_models)
    row = assess_text(text, det, ft_model, cfg)
    assert isinstance(row["keep"], bool)
    assert isinstance(row["scrubbed_text"], str)
    batch = assess_batch([text], BatchDetector(models=packed_models), ft_model, cfg)
    assert batch[0] == row


@settings(max_examples=60, deadline=None)
@given(text=_TEXT)
def test_multilang_sections_invariants(packed_models, text):
    """detect_multi_language is total and structurally sound on fuzz."""
    from lingua_spark.core.detector import Detector
    from lingua_spark.core.multilang import detect_multi_language
    from lingua_spark.uniscript import CAT_LETTER, cat_ids, codes_of

    det = Detector(models=packed_models)
    secs = detect_multi_language(text, det)
    total_letters = int((cat_ids(codes_of(text)) == CAT_LETTER).sum())
    covered = 0
    prev_end = 0
    for s in secs:
        assert 0 <= s["start"] < s["end"] <= len(text)
        assert s["start"] >= prev_end
        prev_end = s["end"]
        covered += s["letters_count"]
    assert covered == total_letters
