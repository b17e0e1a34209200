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
