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


def _bench_pipeline(spark, n_turns: int = N_BENCH_TURNS) -> tuple[float, float]:
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
    # paths), then time the steady-state pass — the number that represents
    # a long-running cluster job, where warm-up is amortized to zero.
    assessed.write.format("noop").mode("overwrite").save()
    t0 = time.time()
    assessed.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    df.unpersist()
    return dt, n / dt


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = _session(f"local[{CPUS}]")
    times = _bench_queries(spark)
    pipe_sec, tps = _bench_pipeline(spark)
    times["quality_pipeline_60k_turns"] = round(pipe_sec, 3)
    spark.stop()
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_pipeline_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "pipeline_turns_per_sec": round(tps, 1),
            }
        )
    )


def scaling() -> None:
    """local[8] vs local[32]: same input, report scaling efficiency."""
    results = {}
    for cores in (8, 32):
        spark = _session(f"local[{cores}]")
        sec, tps = _bench_pipeline(spark, n_turns=N_SCALING_TURNS)
        spark.stop()
        results[cores] = {"sec": round(sec, 3), "turns_per_sec": round(tps, 1)}
    speedup = results[32]["turns_per_sec"] / results[8]["turns_per_sec"]
    eff = speedup / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32_cores",
                "value": round(eff, 4),
                "unit": "fraction",
                "n_turns": N_SCALING_TURNS,
                "local8": results[8],
                "local32": results[32],
                "speedup": round(speedup, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
