"""Per-query isolation benchmark (guide §1.1/§1.4) — NOT used by the driver.

``bench.py`` is frozen for measurement; this harness exists so individual
queries and candidate rewrites can be timed with the noop sink and their
plans captured, without re-running the whole suite.

Usage:
    python bench_extra.py q <name> [reps]        # registry query, warm+timed
    python bench_extra.py explain <name>         # formatted physical plan
    python bench_extra.py sql <file.sql> [reps]  # ad-hoc Spark SQL text
    python bench_extra.py list                   # registry names

Timing policy matches bench.py: one warm-up pass, then ``reps`` timed
noop-sink passes (min + all samples reported). Data dir / cores from
$SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
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


def _session():
    from lingua_spark.engine.pipeline import build_session

    spark = build_session(
        app="lingua-spark-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(mk, reps: int) -> dict:
    _noop(mk())  # warm-up (JIT, page cache) — same policy as bench.py
    samples = []
    for _ in range(reps):
        t0 = time.time()
        _noop(mk())
        samples.append(round(time.time() - t0, 3))
    return {"min": min(samples), "samples": samples}


def main() -> None:
    mode = sys.argv[1]
    spark = _session()
    if mode == "list":
        from __spark_entry__ import queries

        print("\n".join(queries()))
        return
    if mode == "sql":
        from lingua_spark.ops.queries import register_views

        register_views(spark, SF_DIR)
        text = Path(sys.argv[2]).read_text()
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        spark.sparkContext.setJobDescription(f"bench_extra sql {sys.argv[2]}")
        out = _time(lambda: spark.sql(text), reps)
        print(json.dumps({"sql": sys.argv[2], **out}))
        return
    name = sys.argv[2]
    from __spark_entry__ import queries

    fn = queries()[name]
    if mode == "explain":
        fn(spark, SF_DIR).explain("formatted")
        return
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark.sparkContext.setJobDescription(f"bench_extra {name}")
    out = _time(lambda: fn(spark, SF_DIR), reps)
    print(json.dumps({"query": name, **out}))


if __name__ == "__main__":
    main()
