"""Token-budget corpus sampling — select the highest-quality documents
whose token counts fit a global training budget.

A pretraining run buys a fixed number of tokens, not a fixed number of
documents; the curation pipeline must therefore answer "which documents do
I keep so the kept tokens total <= B, preferring higher quality?" The
semantics here are PREFIX SELECTION: order documents by (score DESC,
doc_id ASC) and keep the longest prefix whose cumulative token count stays
within the budget (the deterministic greedy used by quality-ranked data
mixes — not bin packing, a later doc never back-fills a gap left by a
skipped one).

The naive formulation is a single global window::

    sum(tokens) OVER (ORDER BY score DESC, doc_id)

which at 100 TB funnels the whole corpus through ONE reducer (a global
ORDER BY window has a single partition). The Spark implementation instead
uses the classic two-phase distributed-threshold shape:

1. Histogram: groupBy the (integer) quality score — at most ``score_scale
   + 1`` groups regardless of corpus size — and sum tokens per score.
   This is a map-side-combinable aggregation over tiny rows.
2. Driver prefix-sum over the collected histogram (<= 10_001 rows) finds
   the threshold score s*: every document scoring ABOVE s* fits outright;
   the remaining budget R is what's left for the s* bucket.
3. Documents with score > s* pass with no sort at all. Only the single
   boundary bucket s* is window-sorted (by doc_id) to take its in-order
   prefix under R.

So the full-corpus global sort disappears. The boundary bucket itself is
ALSO scanned distributed (round-5): range-partition by doc_id, per-sub-
bucket token sums collected as a second mini-histogram, driver prefix-sum
into offsets, per-sub-bucket windows + offset. Even the worst case (every
document identical score, i.e. the boundary bucket IS the corpus) runs no
single-partition window anywhere; ``tests/test_budget_incremental.py``
pins that degenerate distribution.

The quality score is the lexical-diversity ratio distinct_tokens /
n_tokens, fixed-point floor-scaled to an integer so both engines order
identically (no float-rounding ties diverge). The DuckDB oracle is the
INDEPENDENT naive global-window form, so the gate proves the two-phase
decomposition equals the textbook definition row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .queries import _tokens, register_views

SCORE_SCALE = 10_000


def _exact_budget(total: int, budget_frac: float) -> int:
    """floor(total * budget_frac) in EXACT integer arithmetic. DuckDB
    parses the fraction literal as DECIMAL and floors exactly, while
    float64 ``int(total * 0.4)`` rounds — at petabyte token totals
    (~7e15) the two disagree by 1 token, flipping a boundary document
    in or out of the selection and failing the oracle gate at exactly
    the scale this module is designed for. ``Fraction`` of the decimal
    string reproduces the DECIMAL semantics."""
    from fractions import Fraction

    frac = Fraction(str(budget_frac))
    return total * frac.numerator // frac.denominator


def _scored_sql(dialect: str) -> str:
    """Per-doc (doc_id, tokens, score): whitespace token count and the
    integer-scaled distinct-token ratio. All-integer output so ordering
    and value hashes are engine-portable."""
    toks = _tokens(dialect)
    ln = "size" if dialect == "spark" else "len"
    dedup = "array_distinct" if dialect == "spark" else "list_distinct"
    return f"""
SELECT doc_id,
       CAST({ln}(t) AS BIGINT) AS tokens,
       CAST(floor({ln}({dedup}(t)) * {SCORE_SCALE}.0
                  / greatest({ln}(t), 1)) AS BIGINT) AS score
FROM (SELECT doc_id, {toks} AS t FROM documents)
WHERE {ln}(t) > 0
"""


def token_budget_select(
    spark: SparkSession, sf_dir: str, budget_frac: float = 0.4,
    release_cache: bool = True,
) -> DataFrame:
    """Documents selected under a global token budget of
    ``budget_frac`` x total corpus tokens (prefix selection by
    (score DESC, doc_id)). Returns (doc_id, tokens, score) of the
    selected documents only.

    ``scored`` (the tokenizing scan — the expensive subtree) is persisted
    so the corpus is scanned + tokenized ONCE: the histogram collect
    materializes the cache and the pass/boundary branches read it back.
    With ``release_cache=True`` (default) the small (doc_id, tokens,
    score) result is eagerly materialized and the cache released before
    returning — same hygiene contract as ``jaccard_pairs_df``; pass
    ``False`` to keep the lazy plan (caller owns the release)."""
    from pyspark import StorageLevel

    register_views(spark, sf_dir)
    scored = spark.sql(_scored_sql("spark")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # Phase 1: score histogram — bounded at SCORE_SCALE+1 rows, so the
    # collect is O(score granularity), not O(corpus).
    hist = (
        scored.groupBy("score")
        .agg(F.sum("tokens").alias("bucket_tokens"))
        .collect()
    )
    total = sum(r.bucket_tokens for r in hist)
    budget = _exact_budget(total, budget_frac)

    # Phase 2: driver prefix-sum, descending score.
    taken = 0
    threshold = None  # boundary bucket needing an in-bucket prefix
    remaining = 0
    full_above = SCORE_SCALE + 1  # scores >= this pass outright (none yet)
    for r in sorted(hist, key=lambda r: -r.score):
        if taken + r.bucket_tokens <= budget:
            taken += r.bucket_tokens
            full_above = r.score
        else:
            threshold = r.score
            remaining = budget - taken
            break

    # Phase 3: scores above the boundary pass with no sort. The boundary
    # bucket's in-order prefix is itself computed as a distributed scan
    # (VERDICT r04 item 6) instead of a one-partition window: with
    # SCORE_SCALE buckets over ~10^10 docs a bucket still averages ~10^6
    # rows, and a degenerate score distribution (every doc the same
    # score) would previously funnel the WHOLE corpus through one
    # reducer. Shape: range-partition the bucket by doc_id (ranges are
    # ordered by partition index, so global doc_id order = (pid, doc_id)
    # order), sum tokens per sub-bucket (mini-histogram, <= n_sub rows
    # collected), driver prefix-sum those into per-sub-bucket offsets,
    # then window WITHIN each sub-bucket and add the offset. The output
    # is boundary-placement-independent — a prefix sum over sorted data
    # is the same under any contiguous split — so range-sampling
    # nondeterminism cannot change the selection. The bucket rows are
    # persisted so the sampled range boundaries (and thus pids) are
    # frozen between the offset collect and the window read-back.
    out = scored.filter(F.col("score") >= full_above)
    if threshold is not None:
        from pyspark.sql import Window

        n_sub = max(2, spark.sparkContext.defaultParallelism)
        bucket = (
            scored.filter(F.col("score") == threshold)
            .repartitionByRange(n_sub, "doc_id")
            .withColumn("pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        sub_hist = bucket.groupBy("pid").agg(
            F.sum("tokens").alias("sub_tokens")
        ).collect()
        acc = 0
        offsets = {}
        for r in sorted(sub_hist, key=lambda r: r.pid):
            offsets[r.pid] = acc
            acc += r.sub_tokens
        off_expr = F.element_at(
            F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv]
            ),
            F.col("pid"),
        ) if offsets else F.lit(0)
        w = (
            Window.partitionBy("pid")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        boundary = (
            bucket.withColumn(
                "cum", F.sum("tokens").over(w) + off_expr
            )
            .filter(F.col("cum") <= F.lit(remaining))
            .drop("cum", "pid")
        )
        out = out.unionByName(boundary)
        if release_cache:
            # eager checkpoint below materializes `out`; release then
            try:
                return_df = out.localCheckpoint(eager=True)
            finally:
                bucket.unpersist(blocking=False)
                scored.unpersist(blocking=False)
            return return_df
        from .queries import _attach_release

        return _attach_release(
            out,
            lambda: (
                bucket.unpersist(blocking=False),
                scored.unpersist(blocking=False),
            ),
        )
    if not release_cache:
        from .queries import _attach_release

        return _attach_release(
            out, lambda: scored.unpersist(blocking=False)
        )
    try:
        return out.localCheckpoint(eager=True)
    finally:
        scored.unpersist(blocking=False)


def _scored_by_source_sql(dialect: str) -> str:
    """Per-doc (doc_id, source, tokens, score) — the by-source twin of
    ``_scored_sql`` (same tokenizer, same fixed-point score)."""
    toks = _tokens(dialect)
    ln = "size" if dialect == "spark" else "len"
    dedup = "array_distinct" if dialect == "spark" else "list_distinct"
    return f"""
SELECT doc_id, source,
       CAST({ln}(t) AS BIGINT) AS tokens,
       CAST(floor({ln}({dedup}(t)) * {SCORE_SCALE}.0
                  / greatest({ln}(t), 1)) AS BIGINT) AS score
FROM (SELECT doc_id, source, {toks} AS t FROM documents)
WHERE {ln}(t) > 0
"""


def water_fill(totals: dict[str, int], budget: int) -> dict[str, int]:
    """EQUAL-SHARE WATER-FILLING of an integer token ``budget`` across
    sources: every source gets the common integer water level L — the
    largest integer with sum(min(total_s, L)) <= budget — except sources
    holding fewer tokens, which contribute everything they have (their
    surplus is what raises L for the rest). The sub-L remainder
    (budget - sum(min(total_s, L)), strictly < the number of unsaturated
    sources) goes one extra token to each of the FIRST ``extra``
    unsaturated sources in (total ASC, source ASC) order — fully
    deterministic, no fractional allocations. This is the source-mixing
    primitive of a pretraining data recipe: cap every over-represented
    source at the same level instead of sampling proportionally, the
    integer-exact analog of the uniform-cap mixtures used by large-scale
    corpora (and the fair-allocation classic). Pure integer arithmetic
    so the DuckDB oracle's closed form (no loop: the saturation prefix
    is found by the integer comparison t_r*(n-r+1) <= B-c_{r-1} on the
    ASC-sorted totals) reproduces it bit-exactly at petabyte counts."""
    order = sorted(totals.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(order)
    alloc: dict[str, int] = {}
    remaining = budget
    # saturation prefix: smallest totals that fit entirely under the
    # level computed over the sources still in play
    r = 0
    while r < n and order[r][1] * (n - r) <= remaining:
        src, t = order[r]
        alloc[src] = t
        remaining -= t
        r += 1
    k = n - r  # unsaturated sources sharing the level
    if k:
        level = remaining // k
        extra = remaining - level * k  # < k by construction
        for j, (src, _t) in enumerate(order[r:]):
            alloc[src] = level + (1 if j < extra else 0)
    return alloc


def budget_by_source(
    spark: SparkSession, sf_dir: str, budget_frac: float = 0.9,
    release_cache: bool = True,
) -> DataFrame:
    """Per-source token-budget selection under equal-share water-filling
    (round 5): the global budget is split across sources by
    ``water_fill``; within each source the selection is the same
    quality-ranked prefix as ``token_budget_select`` — order by
    (score DESC, doc_id) and keep the longest prefix whose tokens stay
    within the source's allocation. Returns (doc_id, source, tokens,
    score) of the selected documents.

    Scale shape, same discipline as the global operator — nothing
    corpus-sized is ever sorted or collected:

    1. per-(source, score) histogram: <= n_sources x (SCORE_SCALE+1)
       tiny rows collected (sources at 100 TB number in the hundreds).
    2. driver: water-fill the source allocations, then one descending
       prefix-scan per source over its score histogram -> per-source
       (full_above, boundary score, boundary remainder).
    3. scan side: broadcast-join the per-source threshold table; rows
       scoring above their source's boundary pass with no sort.
    4. all boundary buckets together are range-partitioned by
       (source, doc_id) and prefix-summed with per-(source, pid) driver
       offsets — the same distributed boundary scan as
       ``token_budget_select``, just keyed by source too, so a
       degenerate score distribution still runs no single-partition
       window and a hot source spreads over multiple range partitions.

    The DuckDB oracle is the INDEPENDENT naive form: closed-form
    water-fill via integer prefix comparisons over ASC-sorted totals +
    one global window per source — proving the distributed decomposition
    equals the textbook definition row for row."""
    from pyspark import StorageLevel

    register_views(spark, sf_dir)
    scored = spark.sql(_scored_by_source_sql("spark")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    hist = (
        scored.groupBy("source", "score")
        .agg(F.sum("tokens").alias("bucket_tokens"))
        .collect()
    )
    totals: dict[str, int] = {}
    for r in hist:
        totals[r.source] = totals.get(r.source, 0) + r.bucket_tokens
    budget = _exact_budget(sum(totals.values()), budget_frac)
    alloc = water_fill(totals, budget)

    by_src: dict[str, list] = {}
    for r in hist:
        by_src.setdefault(r.source, []).append(r)
    rows = []  # (source, full_above, threshold, remaining)
    for src, buckets in by_src.items():
        taken = 0
        threshold = None
        remaining = 0
        full_above = SCORE_SCALE + 1
        for r in sorted(buckets, key=lambda r: -r.score):
            if taken + r.bucket_tokens <= alloc[src]:
                taken += r.bucket_tokens
                full_above = r.score
            else:
                threshold = r.score
                remaining = alloc[src] - taken
                break
        rows.append((src, full_above, threshold, remaining))
    thresholds = F.broadcast(
        spark.createDataFrame(
            rows, "source string, full_above long, threshold long,"
            " remaining long"
        )
    )

    joined = scored.join(thresholds, "source")
    out = joined.filter(F.col("score") >= F.col("full_above")).select(
        "doc_id", "source", "tokens", "score"
    )
    n_sub = max(2, spark.sparkContext.defaultParallelism)
    bucket = (
        joined.filter(F.col("score") == F.col("threshold"))
        .select("doc_id", "source", "tokens", "score", "remaining")
        .repartitionByRange(n_sub, "source", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sub_hist = bucket.groupBy("source", "pid").agg(
        F.sum("tokens").alias("sub_tokens")
    ).collect()
    acc: dict[str, int] = {}
    offsets = []
    for r in sorted(sub_hist, key=lambda r: (r.source, r.pid)):
        offsets.append((r.source, r.pid, acc.get(r.source, 0)))
        acc[r.source] = acc.get(r.source, 0) + r.sub_tokens
    if offsets:
        from pyspark.sql import Window

        off_df = F.broadcast(
            spark.createDataFrame(
                offsets, "source string, pid int, off long"
            )
        )
        w = (
            Window.partitionBy("source", "pid")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        boundary = (
            bucket.join(off_df, ["source", "pid"])
            .withColumn("cum", F.sum("tokens").over(w) + F.col("off"))
            .filter(F.col("cum") <= F.col("remaining"))
            .select("doc_id", "source", "tokens", "score")
        )
        out = out.unionByName(boundary)
    if not release_cache:
        from .queries import _attach_release

        return _attach_release(
            out,
            lambda: (
                bucket.unpersist(blocking=False),
                scored.unpersist(blocking=False),
            ),
        )
    try:
        return out.localCheckpoint(eager=True)
    finally:
        bucket.unpersist(blocking=False)
        scored.unpersist(blocking=False)


def budget_by_source_oracle_sql(budget_frac: float = 0.9) -> str:
    """DuckDB oracle: closed-form water-fill (integer comparisons over
    ASC-sorted per-source totals — no driver loop) + the textbook
    per-source global-window prefix selection."""
    scored = _scored_by_source_sql("duckdb")
    return f"""
WITH scored AS ({scored}),
tot AS (
  SELECT source, SUM(tokens) AS total FROM scored GROUP BY source
),
g AS (
  SELECT CAST(floor(SUM(total) * {budget_frac}) AS BIGINT) AS budget,
         COUNT(*) AS n
  FROM tot
),
ranked AS (
  SELECT source, total,
         ROW_NUMBER() OVER (ORDER BY total, source) AS r,
         SUM(total) OVER (ORDER BY total, source
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM tot
),
-- source r saturates iff taking it whole still leaves >= its total per
-- remaining source: t_r * (n - r + 1) <= budget - cum_(r-1); the
-- saturation set is the longest prefix where that holds
flagged AS (
  SELECT r, source, total, cum,
         CASE WHEN total * ((SELECT n FROM g) - r + 1)
                   <= (SELECT budget FROM g) - (cum - total)
              THEN 1 ELSE 0 END AS ok
  FROM ranked
),
pref AS (
  SELECT r, source, total, cum,
         MIN(ok) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS all_ok
  FROM flagged
),
sat AS (
  SELECT COALESCE(MAX(r), 0) AS rstar,
         COALESCE(MAX(cum), 0) AS cumstar
  FROM pref WHERE all_ok = 1
),
lev AS (
  SELECT CASE WHEN n - rstar > 0
              THEN (budget - cumstar) // (n - rstar) ELSE 0 END AS level,
         CASE WHEN n - rstar > 0
              THEN (budget - cumstar)
                   - ((budget - cumstar) // (n - rstar)) * (n - rstar)
              ELSE 0 END AS extra,
         rstar
  FROM (SELECT budget, n, rstar, cumstar FROM g, sat) t
),
alloc AS (
  SELECT p.source,
         CASE WHEN p.r <= l.rstar THEN p.total
              WHEN p.r - l.rstar <= l.extra THEN l.level + 1
              ELSE l.level END AS a
  FROM pref p CROSS JOIN lev l
),
c AS (
  SELECT s.doc_id, s.source, s.tokens, s.score, a.a,
         SUM(s.tokens) OVER (PARTITION BY s.source
                             ORDER BY s.score DESC, s.doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM scored s JOIN alloc a ON s.source = a.source
)
SELECT doc_id, source, tokens, score FROM c WHERE cum <= a
"""


def token_budget_oracle_sql(budget_frac: float = 0.4) -> str:
    """DuckDB oracle: the textbook single-window global prefix selection."""
    scored = _scored_sql("duckdb")
    return f"""
WITH scored AS ({scored}),
tot AS (
  SELECT CAST(floor(sum(tokens) * {budget_frac}) AS BIGINT) AS budget
  FROM scored
),
c AS (
  SELECT doc_id, tokens, score,
         sum(tokens) OVER (ORDER BY score DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM scored
)
SELECT c.doc_id, c.tokens, c.score FROM c, tot WHERE c.cum <= tot.budget
"""
