"""Driver-style side-by-side validation: run each Spark query and its
DuckDB oracle at a given sf dir, compare row count, schema (column names),
and order-insensitive value hash. Usage:

    python scripts/validate_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def norm_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rows = sorted(
        tuple(str(x) for x in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from lingua_spark.engine.pipeline import build_session
    from lingua_spark.ops.queries import (
        FIXTURE_ORACLE_QUERIES,
        FIXTURE_SF_DIR,
        TABLES,
    )

    only = set(sys.argv[2:])
    spark = build_session(app="validate-oracles", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        dsql = oracles.get(name)
        if dsql is None:
            print(f"SKIP {name}: no oracle (rows-only at the driver)")
            continue
        if name in FIXTURE_ORACLE_QUERIES and Path(sf_dir).resolve() != Path(
            FIXTURE_SF_DIR
        ).resolve():
            print(
                f"SKIP {name}: fixture oracle is frozen at {FIXTURE_SF_DIR};"
                f" comparing it against {sf_dir} would mismatch by"
                " construction (regenerate via scripts/gen_expected_fixtures.py"
                " to validate at another scale)"
            )
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        try:
            ddf = con.execute(dsql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_rows = len(sdf) == len(ddf)
        ok_hash = norm_hash(sdf) == norm_hash(ddf) if ok_cols and ok_rows else False
        status = "OK  " if (ok_cols and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: rows {len(sdf)}/{len(ddf)}"
            f" cols={'=' if ok_cols else sorted(sdf.columns)}"
            f" hash={'=' if ok_hash else 'MISMATCH'}"
        )
        if status == "FAIL" and ok_cols and ok_rows:
            merged = sdf.sort_values(sorted(sdf.columns)).reset_index(drop=True)
            merged_d = ddf[sdf.columns].sort_values(sorted(sdf.columns)).reset_index(drop=True)
            for c in sdf.columns:
                a = merged[c].astype(str)
                b = merged_d[c].astype(str)
                bad = (a != b)
                if bad.any():
                    i = bad.idxmax()
                    print(f"   first diff col={c} row={i}: spark={a[i]!r} duckdb={b[i]!r}")
                    break
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
