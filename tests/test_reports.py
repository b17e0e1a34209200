"""Accuracy-report harness + snapshot regression (the reference's
CI-diff gate re-expressed, `.github/workflows/build.yml:33-46`)."""

from pathlib import Path

import pandas as pd

from lingua_spark.corpus import accuracy_corpus
from lingua_spark.reports import accuracy_table, aggregated_csv, predict_corpus

SNAPSHOT = Path(__file__).parent / "snapshots" / "aggregated_accuracy.csv"


def _build(packed_models) -> pd.DataFrame:
    corpus = accuracy_corpus(per_category=4)
    high = accuracy_table(predict_corpus(corpus, packed_models, False))
    low = accuracy_table(predict_corpus(corpus, packed_models, True))
    return aggregated_csv(high, low)


def test_accuracy_report_snapshot(packed_models):
    agg = _build(packed_models)
    assert len(agg) == 79  # one row per language
    assert {"lang", "high_avg", "low_avg"} <= set(agg.columns)
    if not SNAPSHOT.exists():
        SNAPSHOT.parent.mkdir(parents=True, exist_ok=True)
        agg.to_csv(SNAPSHOT, index=False)
    frozen = pd.read_csv(SNAPSHOT)
    pd.testing.assert_frame_equal(
        agg.reset_index(drop=True), frozen, check_dtype=False
    )


def test_accuracy_reasonable(packed_models):
    agg = _build(packed_models)
    # sentence accuracy in high-accuracy mode should be strong on average
    # (reference: English sentences 99.10%, `accuracy-reports/lingua/English.txt`)
    assert agg["high_sentence"].mean() > 85.0
    # high-accuracy mode should beat low-accuracy on average (README claim)
    assert agg["high_avg"].mean() >= agg["low_avg"].mean()


def test_spark_confusion_counts(spark, packed_models):
    from lingua_spark.reports import spark_confusion

    corpus = accuracy_corpus(
        languages=["ENGLISH", "GERMAN", "GREEK"], per_category=3
    )
    pred = predict_corpus(corpus, packed_models)
    conf = spark_confusion(spark, pred).toPandas()
    assert conf.n.sum() == len(pred)
