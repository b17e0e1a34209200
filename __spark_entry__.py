"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship quality-filter pipeline; ``queries`` /
``oracle_sql`` expose the operator inventory (SURVEY.md §2 + training-data
ops) with DuckDB cross-checks. SQL-expressible queries carry a native
DuckDB oracle; the full-detector queries (pandas-UDF core) and the LSH ANN
carry fixture-backed oracles — expected outputs precomputed without Spark
(pure-Python dict oracle / NumPy, scripts/gen_expected_fixtures.py) at
sf0.01 and frozen as Parquet. Per-turn parity is additionally asserted
against the pure-Python oracle in ``tests/test_spark_pipeline.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full per-turn language-ID + quality-filter + scrub pipeline
    over the transcript-shaped documents table at sf0.001."""
    from lingua_spark.engine.pipeline import assess_turns, with_stable_order
    from lingua_spark.ops.queries import documents_as_transcripts

    tdf = documents_as_transcripts(spark, "/root/testdata/sf0.001")
    return assess_turns(spark, with_stable_order(tdf), None, 8)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lingua_spark.ops.queries import (
        SQL_QUERIES,
        ann_ivf_topk_query,
        ann_lsh_topk_query,
        dedup_embedding_neardup_hot_buckets_query,
        dedup_embedding_neardup_query,
        conv_minhash_cc,
        conv_select_with_neardup,
        dedup_minhash_cc,
        transcript_export_full,
        detect_language_counts,
        detect_language_per_doc,
        jaccard_pairs_df,
        make_sql_query,
        multilang_sections_summary,
        quality_pipeline_summary,
    )

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: make_sql_query(name) for name in SQL_QUERIES
    }
    out["detect_language_counts"] = detect_language_counts
    # per-doc twin of the counts query: grades each document's decision
    # against the dict oracle (500-row fixture), not just the aggregate
    out["detect_language_per_doc"] = detect_language_per_doc
    out["quality_pipeline_summary"] = quality_pipeline_summary
    # drop-reason attribution + label-vs-detector confusion matrix
    from lingua_spark.ops.queries import detect_confusion, quality_flag_counts

    out["quality_flag_counts"] = quality_flag_counts
    out["detect_confusion"] = detect_confusion
    out["multilang_sections"] = multilang_sections_summary
    out["ann_lsh_topk"] = ann_lsh_topk_query
    out["ann_ivf_topk"] = ann_ivf_topk_query
    out["dedup_embedding_neardup"] = dedup_embedding_neardup_query
    out["dedup_embedding_neardup_hot_buckets"] = (
        dedup_embedding_neardup_hot_buckets_query
    )
    # persisted-shingle DataFrame variant of dedup_jaccard_pairs (the
    # 100x-scale shape: one shingle explode, cached, same hash joins);
    # value-identical to the SQL form, shares its DuckDB oracle
    out["dedup_jaccard_pairs_df"] = jaccard_pairs_df
    # persisted-fingerprint twin of dedup_fingerprint_pairs (one winnow
    # evaluation instead of CTE-inlined re-computation; shared oracle)
    from lingua_spark.ops.queries import fingerprint_pairs_df

    out["dedup_fingerprint_pairs_df"] = fingerprint_pairs_df
    # persisted-counts DF twin of model_train_ngrams (one corpus-sized
    # explode instead of two); value-identical, shares the SQL oracle
    from lingua_spark.ops.queries import model_train_df

    out["model_train_df"] = model_train_df
    # union-find over the LSH pair graph -> per-doc cluster rep + keep flag
    # (iterative label propagation in Spark; recursive-CTE closure oracle)
    out["dedup_minhash_cc"] = dedup_minhash_cc
    out["conv_minhash_cc"] = conv_minhash_cc
    out["conv_select_with_neardup"] = conv_select_with_neardup
    out["transcript_export_full"] = transcript_export_full
    # same union-find over embedding near-dup pairs (BFS fixture twin)
    from lingua_spark.ops.similarity import dedup_embedding_cc, dedup_semantic

    out["dedup_embedding_cc"] = dedup_embedding_cc
    # SemDeDup: k-means-cell semantic dedup (the IVF-analog scale path
    # for embedding dedup; NumPy-twin fixture oracle)
    out["dedup_semantic"] = dedup_semantic
    # its cell-size audit (the O(cell^2) within-cell stage's balance
    # assumption, surfaced — no-silent-caps rule)
    from lingua_spark.ops.similarity import dedup_semantic_cell_sizes

    out["dedup_semantic_cell_sizes"] = dedup_semantic_cell_sizes
    # quality gate AND dedup-representative: the final selection list
    from lingua_spark.ops.queries import corpus_select_final

    out["corpus_select_final"] = corpus_select_final
    # skew-safe salted two-phase conversation rollup, graded against an
    # UNSALTED single-phase oracle (value-identity of the decomposition)
    from lingua_spark.ops.queries import conv_stats_salted

    out["conv_stats_salted"] = conv_stats_salted
    # token-budget prefix selection: two-phase histogram threshold in
    # Spark, graded against the naive global-window oracle
    from lingua_spark.ops.budget import token_budget_select

    out["corpus_token_budget"] = token_budget_select
    # incoming-batch vs standing-corpus exact dedup behind a broadcast
    # Bloom prefilter; the exact-confirm join makes the output oracle-exact
    from lingua_spark.ops.incremental import dedup_incremental_bloom

    out["dedup_incremental"] = dedup_incremental_bloom
    return out


def oracle_sql() -> dict[str, str]:
    from lingua_spark.ops.queries import (
        FIXTURE_ORACLE_QUERIES,
        SQL_QUERIES,
        fixture_oracle_sql,
    )

    out = {name: dsql for name, (_, dsql) in SQL_QUERIES.items()}
    # non-SQL queries (pandas-UDF detector core / LSH ANN): expected outputs
    # precomputed WITHOUT Spark at sf0.01 (scripts/gen_expected_fixtures.py)
    # and frozen as Parquet — DuckDB reads the fixture.
    for name in FIXTURE_ORACLE_QUERIES:
        out[name] = fixture_oracle_sql(name)
    # the DF variants compute the same results as the SQL forms
    out["dedup_jaccard_pairs_df"] = out["dedup_jaccard_pairs"]
    out["dedup_fingerprint_pairs_df"] = out["dedup_fingerprint_pairs"]
    out["model_train_df"] = out["model_train_ngrams"]
    # independent-algorithm oracle: recursive-CTE transitive closure vs
    # the Spark side's iterative label propagation
    from lingua_spark.ops.queries import (
        conv_minhash_cc_oracle_sql,
        conv_select_with_neardup_oracle_sql,
        transcript_export_full_oracle_sql,
        corpus_select_oracle_sql,
        minhash_cc_oracle_sql,
    )

    out["dedup_minhash_cc"] = minhash_cc_oracle_sql()
    out["conv_minhash_cc"] = conv_minhash_cc_oracle_sql()
    out["conv_select_with_neardup"] = conv_select_with_neardup_oracle_sql()
    out["transcript_export_full"] = transcript_export_full_oracle_sql()
    out["corpus_select_final"] = corpus_select_oracle_sql()
    from lingua_spark.ops.queries import conv_stats_oracle_sql

    out["conv_stats_salted"] = conv_stats_oracle_sql()
    from lingua_spark.ops.budget import token_budget_oracle_sql

    out["corpus_token_budget"] = token_budget_oracle_sql()
    from lingua_spark.ops.incremental import incremental_oracle_sql

    out["dedup_incremental"] = incremental_oracle_sql()
    return out
