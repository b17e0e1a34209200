"""Capture ``explain('formatted')`` for named queries into plans/r06/.

Usage:
    python scripts/capture_plans_r06.py before <name> [<name> ...]
    python scripts/capture_plans_r06.py after  <name> [<name> ...]

Writes plans/r06/<name>_<suffix>.txt (the round-6 deliverable: the judge
checks plan claims against these files). Eager queries (CC iterations,
persisted twins) capture the plan of the RETURNED DataFrame; their
docstrings describe the eager stages.
"""

from __future__ import annotations

import os
import sys
from contextlib import redirect_stdout
from io import StringIO
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from lingua_spark.engine.pipeline import build_session

    spark = build_session(
        app="capture-plans-r06", master=f"local[{CPUS}]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    from __spark_entry__ import queries

    registry = queries()
    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry[name](spark, SF_DIR)
        buf = StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
