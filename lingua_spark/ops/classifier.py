"""Trained quality classifier — the fastText-style learned filter tier.

The heuristic gates (``quality_keep_sql``, Gopher, CCNet buckets) are
rule-based; production curation stacks layer a TRAINED classifier on top,
distilled from a cheap teacher (CCNet trains against Wikipedia, DCLM/
fineweb-edu against model-labeled seeds — public recipes). This module is
that tier as pure SQL, runnable identically in Spark and DuckDB:

- ``quality_nb_train``: multinomial naive-Bayes log-odds table over
  repetition-bucketed token features (see ``_feat``), teacher = the
  heuristic keep gate AND a lexical-diversity cut. One corpus pass:
  label in the scan projection, ONE token explode, map-side-combinable
  per-feature class counts (the Zipf head is absorbed by partial
  aggregation — no hot-token reducer), add-one smoothing against the
  class totals + vocab size.
- ``quality_nb_score``: per-document occurrence-weighted sum of feature
  log-odds + verdict, compared against the teacher (the ``agree`` column
  is the distillation fidelity measurement — 96% at sf0.01).

Numeric discipline: log-odds are FIXED-POINT integers
(``floor(logodds * 10^6)`` as BIGINT) so the per-document score is an
EXACT integer sum — float summation order differs between Spark's
partial-agg tree and DuckDB's single-threaded fold, and a float score
column would hash-mismatch on ulp noise. The only float step is the
per-distinct-token ``ln`` (vocab-sized, not corpus-sized); both engines
evaluate it on identical integer-ratio inputs.

Scale notes (100 TB): the model table is vocab-sized (multi-GB at web
scale but executor-memory-sized) and is BROADCAST into the scoring join
— the corpus-side token explode never shuffles on the token key (which
is maximally skewed: stopwords), and the only corpus exchange is the
final groupBy(doc_id). If vocab outgrows the broadcast budget, drop the
hint and let AQE's skew-join splitting handle the hot tokens.
"""

from __future__ import annotations

FP_SCALE = 1_000_000


def _labeled(dialect: str) -> str:
    """(doc_id, keep, t): teacher label + token array in one scan
    projection. Teacher = the heuristic keep gate AND lexical diversity
    >= 0.45 (~the corpus median — INTEGER-exact rational comparison, no
    float division): the plain heuristic gate passes ~everything on the
    synthetic corpus, and a one-class teacher trains a vacuous model;
    the diversity cut gives the distillation a real decision boundary —
    the same quality-proxy family CCNet/fineweb-edu teachers use."""
    # imported lazily: queries.py registers this module's SQL at its own
    # tail, so a module-level import here would be circular whenever
    # classifier is imported first
    from .queries import _KEEP_EXPR_DUCK, _KEEP_EXPR_SPARK, _tokens

    keep = _KEEP_EXPR_SPARK if dialect == "spark" else _KEEP_EXPR_DUCK
    toks = _tokens(dialect)
    ln = "size" if dialect == "spark" else "len"
    dedup = "array_distinct" if dialect == "spark" else "list_distinct"
    div = (
        f"{ln}({dedup}({toks})) * 10000"
        f" >= 4500 * greatest({ln}({toks}), 1)"
    )
    return f"""
  SELECT doc_id,
         CAST(({keep}) AND {div} AS BOOLEAN) AS keep,
         {toks} AS t
  FROM documents
"""


def _feat(dialect: str) -> str:
    """(doc_id, keep, f, c): repetition-bucketed multinomial features —
    f = token '#' min(in-doc count, 3), c = the in-doc count. A plain
    bag-of-words NB cannot learn the diversity boundary on a small
    shared vocabulary (59% agreement measured); bucketing the per-doc
    occurrence count into the feature identity lets a LINEAR model
    represent repetition structure (96% agreement on the same teacher) —
    the engineered-feature move of fastText-style filters (char n-grams
    there, count buckets here). groupBy(doc_id, token) is map-side
    combinable and skew-free by construction (doc_id spreads the hot
    stopwords)."""
    unnest = "explode" if dialect == "spark" else "unnest"
    return f"""
  SELECT doc_id, keep,
         concat(token, '#', least(count(*), 3)) AS f,
         CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT doc_id, keep, {unnest}(t) AS token FROM labeled
  ) occ
  GROUP BY doc_id, keep, token
"""


def nb_train_sql(dialect: str) -> str:
    """Per-feature (feature, n_keep, n_drop, logodds_fp) model table —
    multinomial counts weighted by in-doc occurrences, add-one smoothed
    against the class totals + vocabulary size."""
    return f"""
WITH labeled AS ({_labeled(dialect)}),
feat AS ({_feat(dialect)}),
counts AS (
  SELECT f,
         SUM(CASE WHEN keep THEN c ELSE 0 END) AS n_keep,
         SUM(CASE WHEN keep THEN 0 ELSE c END) AS n_drop
  FROM feat GROUP BY f
),
tot AS (
  SELECT SUM(n_keep) AS k_tot, SUM(n_drop) AS d_tot, COUNT(*) AS v
  FROM counts
)
SELECT f AS feature,
       CAST(n_keep AS BIGINT) AS n_keep,
       CAST(n_drop AS BIGINT) AS n_drop,
       CAST(floor((ln((n_keep + 1.0) / (k_tot + v))
                   - ln((n_drop + 1.0) / (d_tot + v)))
                  * {FP_SCALE}.0) AS BIGINT) AS logodds_fp
FROM counts CROSS JOIN tot
"""


def nb_score_sql(dialect: str) -> str:
    """Per-document NB score (exact integer sum of occurrence-weighted
    feature log-odds), classifier verdict, teacher verdict, and the
    agreement flag (distillation fidelity).

    Round 6: the teacher verdict rides the SCORING aggregate
    (``bool_or(keep)`` — ``keep`` is constant per doc on every feat
    row, and the feat->model join is total because the model is
    trained on the same corpus, so every doc with >= 1 feature
    survives with its teacher bit) instead of a separate join against
    a third tokenize pass of ``labeled``. One fewer corpus pass and
    one fewer doc-keyed join+exchange pair; result rows identical
    (the old inner join kept exactly the scored docs). The remaining
    passes are the train side's counts + totals (Spark inlines the
    twice-referenced counts CTE) and the scoring explode — a
    production run persists the vocab-sized model between train and
    score instead (see module notes)."""
    train = nb_train_sql(dialect)
    # the model is re-stated as a CTE: the oracle gate needs ONE
    # self-contained string per dialect. The DuckDB ORACLE text below
    # is frozen (round-5 fingerprint) — only the Spark side carries
    # the round-6 restructure.
    if dialect == "spark":
        return f"""
WITH model AS ({train}),
labeled AS ({_labeled(dialect)}),
feat AS ({_feat(dialect)}),
scored AS (
  SELECT /*+ BROADCAST(m) */ t.doc_id,
         CAST(SUM(t.c * m.logodds_fp) AS BIGINT) AS score_fp,
         CAST(COUNT(*) AS BIGINT) AS n_features,
         bool_or(t.keep) AS teacher_keep
  FROM feat t JOIN model m ON t.f = m.feature
  GROUP BY t.doc_id
)
SELECT doc_id, n_features, score_fp,
       CAST(score_fp > 0 AS BOOLEAN) AS clf_keep,
       teacher_keep,
       CAST((score_fp > 0) = teacher_keep AS BOOLEAN) AS agree
FROM scored
"""
    return f"""
WITH model AS ({train}),
labeled AS ({_labeled(dialect)}),
feat AS ({_feat(dialect)}),
scored AS (
  SELECT t.doc_id,
         CAST(SUM(t.c * m.logodds_fp) AS BIGINT) AS score_fp,
         CAST(COUNT(*) AS BIGINT) AS n_features
  FROM feat t JOIN model m ON t.f = m.feature
  GROUP BY t.doc_id
)
SELECT s.doc_id, s.n_features, s.score_fp,
       CAST(s.score_fp > 0 AS BOOLEAN) AS clf_keep,
       l.keep AS teacher_keep,
       CAST((s.score_fp > 0) = l.keep AS BOOLEAN) AS agree
FROM scored s JOIN (SELECT doc_id, keep FROM labeled) l
  ON s.doc_id = l.doc_id
"""


# fixed sweep of fixed-point decision thresholds (units of logodds*10^6):
# symmetric around the NB default 0, spanning the score range observed on
# the synthetic corpus so the sweep brackets the operating point
CALIBRATION_THRESHOLDS = (
    -20_000_000, -5_000_000, -1_000_000, 0, 1_000_000, 5_000_000,
    20_000_000,
)


def nb_calibration_sql(dialect: str) -> str:
    """Threshold-sweep calibration audit for the trained classifier: for
    each candidate decision threshold, the confusion counts against the
    teacher plus precision / recall / F1 — the table you read before
    moving the operating point (fineweb-edu publishes exactly this sweep
    for its classifier cut; public recipe). A learned filter shipped
    without its calibration table is a silent-caps violation: the 0
    threshold is a choice, and this surfaces what the other choices
    would do.

    Scale shape: the per-doc scores come from the same scoring join as
    ``quality_nb_score`` (one corpus pass, broadcast model); the sweep
    is a cross join against a {n}-row literal VALUES table — the
    per-(threshold) confusion counts are ONE map-side-combinable
    aggregate over (tiny threshold int × boolean) rows, never a second
    corpus pass per threshold. Ratios are computed AFTER the BIGINT
    confusion counts (CAST ... AS DOUBLE of identical integer inputs —
    engine-portable), NULL when undefined (no predicted / no actual
    positives).""".format(n=len(CALIBRATION_THRESHOLDS))
    vals = ", ".join(f"({t})" for t in CALIBRATION_THRESHOLDS)
    score = nb_score_sql(dialect)
    return f"""
WITH s AS ({score}),
sweep AS (
  SELECT t.thr,
         CAST(sum(CASE WHEN s.score_fp > t.thr AND s.teacher_keep
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN s.score_fp > t.thr AND NOT s.teacher_keep
                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN s.score_fp <= t.thr AND s.teacher_keep
                       THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN s.score_fp <= t.thr AND NOT s.teacher_keep
                       THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM s CROSS JOIN (VALUES {vals}) AS t(thr)
  GROUP BY t.thr
)
SELECT CAST(thr AS BIGINT) AS threshold_fp, tp, fp, fn, tn,
       CAST(tp AS DOUBLE) / nullif(tp + fp, 0) AS precision_keep,
       CAST(tp AS DOUBLE) / nullif(tp + fn, 0) AS recall_keep,
       CAST(2 * tp AS DOUBLE) / nullif(2 * tp + fp + fn, 0) AS f1_keep,
       CAST((tp + tn) AS DOUBLE) / nullif(tp + fp + fn + tn, 0)
         AS accuracy
FROM sweep
"""
