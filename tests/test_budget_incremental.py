"""Token-budget sampling and Bloom-prefiltered incremental dedup.

Both operators are graded by the driver's DuckDB oracle at sf0.01; these
tests pin the parts the oracle can't see — the two-phase threshold
decomposition against a local full-sort greedy, budget edge cases, and
that the Bloom prefilter actually filters (it is allowed to be
semantics-free, not allowed to be a no-op scan)."""

import pytest

SF = "/root/testdata/sf0.001"


def _local_greedy(scored_pdf, frac):
    """Reference: full sort by (score DESC, doc_id), prefix under budget."""
    df = scored_pdf.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    budget = int(df["tokens"].sum() * frac)
    cum = df["tokens"].cumsum()
    return set(df.loc[cum <= budget, "doc_id"])


@pytest.fixture(scope="module")
def scored(spark):
    from lingua_spark.ops.budget import _scored_sql
    from lingua_spark.ops.queries import register_views

    register_views(spark, SF)
    return spark.sql(_scored_sql("spark")).toPandas()


@pytest.mark.parametrize("frac", [0.1, 0.4, 0.75])
def test_token_budget_matches_local_greedy(spark, scored, frac):
    """The histogram-threshold + boundary-bucket decomposition selects
    EXACTLY the local full-sort greedy prefix, at cuts that land in
    different buckets."""
    from lingua_spark.ops.budget import token_budget_select

    got = {
        r.doc_id
        for r in token_budget_select(spark, SF, budget_frac=frac).collect()
    }
    want = _local_greedy(scored, frac)
    assert got == want
    assert 0 < len(got) < len(scored)  # the cut is real, not degenerate


def test_token_budget_full_budget_selects_everything(spark, scored):
    from lingua_spark.ops.budget import token_budget_select

    got = token_budget_select(spark, SF, budget_frac=1.0)
    assert got.count() == len(scored)


def test_token_budget_zero_budget_selects_nothing(spark):
    from lingua_spark.ops.budget import token_budget_select

    assert token_budget_select(spark, SF, budget_frac=0.0).count() == 0


def test_nb_classifier_learns_the_teacher(spark):
    """Trained quality classifier (round 5): the teacher must be
    two-class on the synthetic corpus (a one-class teacher trains a
    vacuous model), the repetition-bucketed NB must reach >= 0.9
    agreement with it (bag-of-words alone measured 0.59 — the feature
    bucketing is load-bearing), and the scoring join must BROADCAST the
    vocab-sized model so the corpus side never shuffles on the
    maximally-skewed token key."""
    from lingua_spark.ops.queries import SQL_QUERIES, register_views

    register_views(spark, SF)
    df = spark.sql(SQL_QUERIES["quality_nb_score"][0])
    pdf = df.toPandas()
    keep_rate = pdf.teacher_keep.mean()
    assert 0.2 < keep_rate < 0.8, f"degenerate teacher: {keep_rate}"
    assert pdf.agree.mean() >= 0.9, pdf.agree.mean()
    # exact integer scores: fixed-point sums can never be fractional
    assert pdf.score_fp.dtype.kind == "i"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_nb_calibration_sweep_invariants(spark):
    """quality_nb_calibration: one row per threshold, the confusion
    counts partition the corpus at EVERY threshold, predicted-keep
    counts are monotonically non-increasing in the threshold (raising
    the bar never admits more documents), and the threshold-0 row
    reproduces quality_nb_score's agreement exactly."""
    from lingua_spark.ops.classifier import CALIBRATION_THRESHOLDS
    from lingua_spark.ops.queries import SQL_QUERIES, register_views

    register_views(spark, SF)
    cal = (
        spark.sql(SQL_QUERIES["quality_nb_calibration"][0])
        .toPandas()
        .sort_values("threshold_fp")
        .reset_index(drop=True)
    )
    assert list(cal.threshold_fp) == sorted(CALIBRATION_THRESHOLDS)
    score = spark.sql(SQL_QUERIES["quality_nb_score"][0]).toPandas()
    n = len(score)
    assert ((cal.tp + cal.fp + cal.fn + cal.tn) == n).all()
    pred = cal.tp + cal.fp
    assert (pred.diff().dropna() <= 0).all(), "keep count must shrink"
    zero = cal[cal.threshold_fp == 0].iloc[0]
    assert zero.tp + zero.tn == score.agree.sum()
    # ratio columns agree with their integer numerators/denominators
    ok = cal.tp + cal.fp > 0
    assert (
        cal[ok].precision_keep == cal[ok].tp / (cal[ok].tp + cal[ok].fp)
    ).all()


def test_water_fill_matches_brute_force_definition():
    """water_fill (the sequential integer loop the Spark driver runs)
    must equal the DECLARATIVE definition the DuckDB oracle encodes:
    L = max integer with sum(min(total_s, L)) <= B, saturated sources
    take their total, the first `extra` unsaturated sources in
    (total ASC, source ASC) order get one extra token. Hypothesis fuzz
    over adversarial totals (zeros, duplicates, hot sources)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lingua_spark.ops.budget import water_fill

    def brute(totals: dict[str, int], budget: int) -> dict[str, int]:
        budget = min(budget, sum(totals.values()))
        lo = 0
        hi = max(totals.values(), default=0)
        while lo < hi:  # max L with sum(min(t, L)) <= budget
            mid = (lo + hi + 1) // 2
            if sum(min(t, mid) for t in totals.values()) <= budget:
                lo = mid
            else:
                hi = mid - 1
        level = lo
        alloc = {s: min(t, level) for s, t in totals.items()}
        extra = budget - sum(alloc.values())
        for s, t in sorted(totals.items(), key=lambda kv: (kv[1], kv[0])):
            if extra == 0:
                break
            if t > level:
                alloc[s] += 1
                extra -= 1
        assert extra == 0
        return alloc

    @settings(max_examples=300, deadline=None)
    @given(
        totals=st.dictionaries(
            st.text(alphabet="abcdef", min_size=1, max_size=3),
            st.integers(min_value=0, max_value=10_000),
            min_size=1,
            max_size=8,
        ),
        budget=st.integers(min_value=0, max_value=60_000),
    )
    def check(totals, budget):
        got = water_fill(totals, budget)
        assert got == brute(totals, budget)
        assert sum(got.values()) == min(budget, sum(totals.values()))

    check()


def test_budget_by_source_skewed_matches_local_greedy(spark, tmp_path):
    """End-to-end on a SKEWED synthetic corpus (one hot source with 10x
    the tokens of the rest): water-filling must cap the hot source at
    the common level while small sources keep everything, and the
    per-source selection must equal the local full-sort greedy under
    each source's allocation. Also pins the plan: every window
    partitions by (source, pid) — never a single-partition window."""
    import pandas as pd

    from lingua_spark.ops.budget import budget_by_source, water_fill
    from lingua_spark.ops.queries import TABLES

    for t in TABLES:
        if t != "documents":
            (tmp_path / f"{t}.parquet").symlink_to(SF + f"/{t}.parquet")
    rows = []
    did = 0
    for s, n_docs, wlen in [("hot", 200, 40), ("mid", 40, 20), ("sml", 8, 10)]:
        for i in range(n_docs):
            # all-distinct tokens -> every doc scores SCORE_SCALE: the
            # adversarial case where each source IS one boundary bucket
            toks = [f"{s}{i:03d}w{j}" for j in range(wlen)]
            rows.append((did, " ".join(toks), "en", s, len(" ".join(toks))))
            did += 1
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"}).to_parquet(
        tmp_path / "documents.parquet", index=False
    )

    lazy = budget_by_source(
        spark, str(tmp_path), budget_frac=0.5, release_cache=False
    )
    got = lazy.toPandas()
    totals = {"hot": 200 * 40, "mid": 40 * 20, "sml": 8 * 10}
    alloc = water_fill(totals, sum(totals.values()) // 2)
    assert alloc["sml"] == 80, alloc  # small source fully kept
    assert alloc["hot"] < totals["hot"], alloc  # hot source capped
    # per-source doc_id-ascending prefix under the allocation
    for s, grp in got.groupby("source"):
        sizes = pd.Series(
            {r[0]: len(r[1].split()) for r in rows if r[3] == s}
        ).sort_index()
        want = set(sizes.index[sizes.cumsum() <= alloc[s]])
        assert set(grp["doc_id"]) == want, s
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        assert "source" in spec and "pid" in spec, spec


def test_token_budget_degenerate_score_no_single_partition_window(
    spark, tmp_path
):
    """VERDICT r04 item 6: every document shares ONE score (all-distinct
    tokens -> score == SCORE_SCALE exactly), so the boundary bucket IS
    the corpus — the adversarial case where the old
    ``Window.partitionBy("score")`` ran the whole input through one
    reducer. The range-partitioned two-phase prefix sum must (a) still
    select exactly the local greedy prefix and (b) window over the
    doc_id sub-buckets (plan partitions by pid, never by the constant
    score)."""
    import pandas as pd

    from lingua_spark.ops.budget import token_budget_select
    from lingua_spark.ops.queries import TABLES

    # synthetic sf dir: real sf0.001 tables, documents replaced by 400
    # docs of i+1 all-distinct tokens each (identical diversity ratio)
    for t in TABLES:
        if t != "documents":
            (tmp_path / f"{t}.parquet").symlink_to(SF + f"/{t}.parquet")
    texts = [
        " ".join(f"tok{i:04d}x{j}" for j in range(i + 1))
        for i in range(400)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(400), dtype="int64"),
            "text": texts,
            "lang": ["en"] * 400,
            "source": ["synthetic"] * 400,
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    lazy = token_budget_select(
        spark, str(tmp_path), budget_frac=0.4, release_cache=False
    )
    got = lazy.toPandas()
    # one score bucket for the whole corpus
    assert set(got["score"]) == {10_000}
    # exact greedy prefix: doc_id ascending within the single score
    sizes = pd.Series({i: i + 1 for i in range(400)}).sort_index()
    budget = int(sizes.sum() * 0.4)
    want = set(sizes.index[sizes.cumsum() <= budget])
    assert set(got["doc_id"]) == want
    # plan gate: the only windows partition by the doc_id-range pid —
    # no window may partition by the (constant) score column
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "pid" in spec and "score" not in spec.split(",")[0], spec


def test_incremental_bloom_matches_plain_join(spark):
    """End-to-end (doc_id, is_dup, dup_of) equals the plain min-match
    left join computed locally on the same cleaned text."""
    from lingua_spark.ops.incremental import _halves, dedup_incremental_bloom
    from lingua_spark.ops.queries import register_views

    register_views(spark, SF)
    corpus, incoming = _halves(spark.table("documents"))
    cp = corpus.select("doc_id", "c").toPandas()
    ip = incoming.select("doc_id", "c").toPandas()
    best = cp.groupby("c")["doc_id"].min()
    want = {
        int(r.doc_id): best.get(r.c) for r in ip.itertuples(index=False)
    }

    got = dedup_incremental_bloom(spark, SF).collect()
    assert len(got) == len(ip)
    for r in got:
        exp = want[r.doc_id]
        if exp is None:
            assert not r.is_dup and r.dup_of is None
        else:
            assert r.is_dup and r.dup_of == int(exp)


def test_incremental_bloom_prefilter_actually_filters(spark):
    """The Bloom pass must drop most non-matching corpus rows before the
    confirm join (no false negatives is the oracle's job; this pins the
    false-POSITIVE rate low enough that the prefilter pays for itself)."""
    import numpy as np
    from pyspark.sql import functions as F

    from lingua_spark.ops.incremental import (
        BLOOM_BITS,
        BLOOM_K,
        _bloom_bitmap,
        _halves,
    )
    from lingua_spark.ops.queries import register_views

    register_views(spark, SF)
    corpus, incoming = _halves(spark.table("documents"))
    bm = _bloom_bitmap(incoming)

    probes = corpus.select(
        "doc_id",
        *[
            F.pmod(F.xxhash64("h", F.lit(j)), F.lit(BLOOM_BITS)).alias(
                f"p{j}"
            )
            for j in range(BLOOM_K)
        ],
    ).toPandas()
    ok = np.ones(len(probes), dtype=bool)
    for j in range(BLOOM_K):
        v = probes[f"p{j}"].to_numpy(dtype=np.int64)
        ok &= (bm[v >> 6] >> (v & 63).astype(np.uint64)) & np.uint64(
            1
        ) != 0
    n_corpus, n_survive = len(probes), int(ok.sum())

    # true matches (lower bound on survivors: Bloom has no false negatives)
    cp = corpus.select("c").toPandas()["c"]
    inc_texts = set(incoming.select("c").toPandas()["c"])
    n_true = int(cp.isin(inc_texts).sum())

    assert n_survive >= n_true
    # at a 1:9 batch:corpus ratio with m=2^20, k=4 the FP rate is well
    # under 1%; require the prefilter to kill at least half the corpus
    assert n_survive - n_true <= max(10, n_corpus // 100)
    assert n_survive < n_corpus // 2


def test_exact_budget_matches_decimal_floor_at_petabyte_totals():
    """The budget must be computed in exact integer arithmetic: float64
    total*0.4 rounds up by one token at ~7e15 totals while DuckDB's
    DECIMAL floor is exact — a 1-token budget difference flips a
    boundary document."""
    from lingua_spark.ops.budget import _exact_budget

    total = 7_039_962_107_496_397
    assert _exact_budget(total, 0.4) == total * 2 // 5  # 2815984842998558
    assert int(total * 0.4) != _exact_budget(total, 0.4)  # the float bug
    assert _exact_budget(10, 0.4) == 4
    assert _exact_budget(0, 0.4) == 0
    assert _exact_budget(7, 0.5) == 3
