"""Golden-confidence regression corpus (FIXTURES.md §5, the analog of
`LanguageDetector_Test.kt:56-209` + the CI report-diff gate).

Exact confidence values for fixed probe texts, generated once by the
pure-Python oracle over our trained models, frozen as a snapshot, and
diffed on every run. Any change to models, hashing, summation order, or
rule constants trips this test — by design.
"""

import json
from pathlib import Path

import pytest

from lingua_spark import langdata as L
from lingua_spark.oracle import OracleDetector

SNAPSHOT = Path(__file__).parent / "snapshots" / "golden_confidences.json"

PROBE_TEXTS = [
    "this is a short test",
    "das ist ein deutscher satz",
    "les enfants jouent dans le jardin",
    "el niño juega en el jardín",
    "это очень большой город",
    "日本語のテキストです",
    "한국어 텍스트입니다",
    "Ελληνικά είναι ωραία",
    "والموضوع مهم جدا",
    "veszélyes és gyönyörű",
    "different words altogether here",
    "to be or not to be that is the question",
]

MULTI_PROBE_TEXTS = [
    'He asked: "Ελληνικά είναι ωραία" and left.',
    "日本語です and english text follows",
    "just one language in this text",
]


def _build(oracle_tables, packed_models):
    ora = OracleDetector(tables=oracle_tables)
    from lingua_spark.core.detector import Detector
    from lingua_spark.core.multilang import detect_multi_language

    det = Detector(models=packed_models)
    golden = {
        "confidences": {
            t: [[lang, conf] for lang, conf in ora.confidence_values(t)]
            for t in PROBE_TEXTS
        },
        "sections": {
            t: [
                {k: s[k] for k in ("start", "end", "letters_count", "lang")}
                for s in detect_multi_language(t, det)
            ]
            for t in MULTI_PROBE_TEXTS
        },
    }
    return golden


def test_golden_confidences_frozen(oracle_tables, packed_models):
    golden = _build(oracle_tables, packed_models)
    if not SNAPSHOT.exists():
        SNAPSHOT.parent.mkdir(parents=True, exist_ok=True)
        SNAPSHOT.write_text(json.dumps(golden, ensure_ascii=False, indent=1))
    frozen = json.loads(SNAPSHOT.read_text())
    assert golden == frozen


def test_goldens_engine_matches_oracle(oracle_tables, packed_models):
    """The engine must reproduce the frozen oracle goldens bit-for-bit."""
    from lingua_spark.core.detector import Detector

    det = Detector(models=packed_models)
    frozen = json.loads(SNAPSHOT.read_text()) if SNAPSHOT.exists() else None
    if frozen is None:
        pytest.skip("snapshot not yet generated")
    for text, confs in frozen["confidences"].items():
        got = [[lang, conf] for lang, conf in det.confidence_values(text)]
        assert got == confs, text
