"""spark-submit entry point for the transcript quality-filter pipeline
(north rule: "submitted via spark-submit --py-files").

    python scripts/build_pyfiles.py dist/lingua_spark.zip
    spark-submit --py-files dist/lingua_spark.zip scripts/run_pipeline.py \
        --input /data/transcripts.parquet --output /data/assessed \
        --format auto --partitions 64 --waves 4

Master/executors come from spark-submit; running this file directly with
a local master also works (ship_package() re-ships the package). Prints
one JSON line with the run summary (processed/skipped partitions,
per-partition metrics live in <output>/metrics/).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="table name or path")
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--format", default="auto", choices=["auto", "iceberg", "parquet"]
    )
    ap.add_argument("--where", default=None, help="pushdown predicate")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None, help="only for local runs")
    args = ap.parse_args()

    from lingua_spark.engine.pipeline import build_session, run_pipeline
    from lingua_spark.io import read_transcripts

    spark = build_session(app="lingua-spark-pipeline", master=args.master)
    df = read_transcripts(spark, args.input, args.format, args.where)
    res = run_pipeline(
        spark,
        df,
        args.output,
        n_partitions=args.partitions,
        waves=args.waves,
        resume=not args.no_resume,
    )
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
