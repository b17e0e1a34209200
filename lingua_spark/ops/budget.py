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

So the full-corpus global sort disappears; the only window runs over one
score bucket. Worst case (every document identical score) degrades to the
naive shape — the score granularity (``score_scale``) bounds how much of
the corpus a bucket can hold in practice, and the histogram makes the
skew visible before the sort runs.

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

    # Phase 3: scores above the boundary pass with no sort; only the one
    # boundary bucket is window-sorted (partition = that bucket).
    out = scored.filter(F.col("score") >= full_above)
    if threshold is not None:
        from pyspark.sql import Window

        w = (
            Window.partitionBy("score")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        boundary = (
            scored.filter(F.col("score") == threshold)
            .withColumn("cum", F.sum("tokens").over(w))
            .filter(F.col("cum") <= F.lit(remaining))
            .drop("cum")
        )
        out = out.unionByName(boundary)
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
