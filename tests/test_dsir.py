"""DSIR importance resampling (ops/dsir.py).

The driver's DuckDB oracle grades the full output at sf0.01; these tests
pin what that gate can't see — that the distributed coarse-histogram
top-k equals a local full sort at several keep fractions, that the
importance scores point the right way (toward the teacher's keep class),
the degenerate-corpus behavior of BOTH dialects, and the plan shape
(the 4096-row λ table is broadcast, never shuffled against)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def keyed(spark):
    from lingua_spark.ops.dsir import dsir_keyed_sql
    from lingua_spark.ops.queries import register_views

    register_views(spark, SF)
    return spark.sql(dsir_keyed_sql("spark")).toPandas()


@pytest.mark.parametrize("den", [2, 4, 10])
def test_dsir_matches_local_topk(spark, keyed, den):
    """The two-phase coarse-bucket threshold keeps EXACTLY the local
    full-sort top-(n // den) by (sample_key DESC, doc_id) — boundary
    cuts land in different coarse buckets at different fractions."""
    from lingua_spark.ops.dsir import dsir_select

    got = dsir_select(spark, SF, keep_frac_den=den).toPandas()
    assert len(got) == len(keyed)
    k = len(keyed) // den
    want = set(
        keyed.sort_values(
            ["sample_key_fp", "doc_id"], ascending=[False, True]
        ).doc_id.head(k)
    )
    assert set(got[got.keep].doc_id) == want
    assert got.keep.sum() == k


def test_dsir_importance_direction(spark, keyed):
    """Teacher-keep documents score higher on average than teacher-drop
    documents — the importance ratio points toward the target domain
    (otherwise the resample would anti-select quality)."""
    from lingua_spark.ops.classifier import _labeled

    labels = spark.sql(
        f"SELECT doc_id, keep FROM ({_labeled('spark')}) t"
    ).toPandas()
    m = keyed.merge(labels, on="doc_id")
    assert m[m.keep].z_fp.mean() > m[~m.keep].z_fp.mean()
    # guard against a vacuous teacher: both classes must be populated
    assert 0 < m.keep.sum() < len(m)


def test_dsir_degenerate_corpus_both_dialects(spark):
    """NULL / empty / whitespace-only documents produce NO features and
    are excluded from the resample in BOTH engines (Spark's
    size(NULL) = -1 and DuckDB's len(NULL) = NULL both clamp out)."""
    from lingua_spark.ops.dsir import dsir_oracle_sql

    rows = [(0, None), (1, ""), (2, "   ")]
    spark.createDataFrame(rows, ["doc_id", "text"]).createOrReplaceTempView(
        "documents"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    duck = con.execute(dsir_oracle_sql()).df()
    assert len(duck) == 0

    # Spark path: register_views would clobber the temp view with the
    # parquet table, so drive the keyed SQL + select on the temp view
    # by calling the internals directly
    from lingua_spark.ops.dsir import dsir_keyed_sql

    sdf = spark.sql(dsir_keyed_sql("spark")).toPandas()
    assert len(sdf) == 0
    assert list(sdf.columns) == ["doc_id", "z_fp", "sample_key_fp"]


def test_dsir_keyed_df_matches_sql(spark, keyed):
    """The canonical single-explode DataFrame twin is value-identical
    to the SQL keyed form (which is the DuckDB oracle's definition)."""
    from lingua_spark.ops.dsir import dsir_keyed_df
    from lingua_spark.ops.queries import register_views

    register_views(spark, SF)
    df, caches = dsir_keyed_df(spark)
    try:
        got = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    finally:
        for c in caches:
            c.unpersist(blocking=False)
    want = keyed.sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[["doc_id", "z_fp", "sample_key_fp"]],
        want[["doc_id", "z_fp", "sample_key_fp"]],
    )


def _leaf_names(df):
    plan = df._jdf.queryExecution().executedPlan()
    if "AdaptiveSparkPlan" in plan.getClass().getSimpleName():
        plan = plan.initialPlan()
    leaves = plan.collectLeaves()
    return [
        leaves.apply(i).getClass().getSimpleName()
        for i in range(leaves.size())
    ]


def test_dsir_df_single_corpus_pass(spark):
    """Plan gate for the round-4 CTE-re-inlining class of defect: the
    SQL keyed form re-inlines the corpus explode THREE times (occ +
    counts via tot and lam — three FileSourceScan leaves); the
    canonical DF twin must read the corpus from parquet exactly once
    (inside the persisted occ aggregate) — every leaf of its executed
    plan is an InMemoryTableScan, never a file scan."""
    from lingua_spark.ops.dsir import dsir_keyed_df, dsir_keyed_sql
    from lingua_spark.ops.queries import register_views

    register_views(spark, SF)
    sql_leaves = _leaf_names(spark.sql(dsir_keyed_sql("spark")))
    assert (
        sum("FileSourceScan" in n or "BatchScan" in n for n in sql_leaves)
        == 3
    )

    df, caches = dsir_keyed_df(spark)
    try:
        df.count()  # materialize the caches so leaves are cache scans
        leaves = _leaf_names(df)
        assert leaves, "plan has no leaves?"
        assert all("InMemoryTableScan" in n for n in leaves), leaves
        # the one real corpus pass: occ is a SINGLE InMemoryRelation
        # (its toString prints the cached plan twice — logical +
        # physical repr of the same relation — so count relations, not
        # Generate/FileScan lines)
        occ_str = caches[0]._jdf.queryExecution().executedPlan().toString()
        assert occ_str.count("InMemoryRelation") == 1
        assert _leaf_names(caches[0]) == ["InMemoryTableScanExec"]
    finally:
        for c in caches:
            c.unpersist(blocking=False)


def test_dsir_lambda_table_is_broadcast(spark):
    """Plan gate: the scoring join builds the 4096-row λ table as a
    BroadcastExchange — the corpus-side feature explode must never
    shuffle on the (maximally skewed) bucket key."""
    from lingua_spark.ops.dsir import dsir_keyed_sql
    from lingua_spark.ops.queries import register_views

    register_views(spark, SF)
    df = spark.sql(dsir_keyed_sql("spark"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_coarse_width_bounds_histogram():
    """VERDICT r05 watch item: the coarse histogram collect must be
    provably bounded whatever the sample-key RANGE. Planted ranges from
    degenerate to 2^63-wide all stay under the cap, the width never
    drops below the base COARSE, widths are powers of two times COARSE
    (bucket assignment stays a cheap shift), and the default corpus
    range keeps the base width (no behaviour change where the old
    fixed shift was already fine)."""
    from lingua_spark.ops.dsir import COARSE, _COARSE_CAP, _coarse_width

    assert _coarse_width(None, None) == COARSE
    assert _coarse_width(0, 0) == COARSE
    assert _coarse_width(-1_000_000, 50_000_000_000) == COARSE
    for lo, hi in [
        (-(2**62), 2**62),
        (0, 2**63 - 1),
        (-(2**40), 2**55),
        (-123, 10**15),
    ]:
        w = _coarse_width(lo, hi)
        assert (hi - lo) // w + 1 <= _COARSE_CAP, (lo, hi, w)
        assert w >= COARSE and w % COARSE == 0
        q, r = divmod(w, COARSE)
        assert r == 0 and (q & (q - 1)) == 0  # power-of-two multiple
