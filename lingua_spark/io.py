"""Transcript-table I/O: Iceberg first, Parquet fallback (north rule).

The north rule reads "Iceberg transcript tables at 10^12-turn scale".
This container ships no Iceberg runtime jar, so the Iceberg path is
implemented against the public Spark DataSourceV2 surface
(``spark.read.format("iceberg")`` / catalog table names, the documented
apache/iceberg Spark integration) and degrades with a clear error when
the runtime is absent; the Parquet path exercises the identical
DataFrame lineage. Everything downstream (stable ordering, assessment,
per-partition lineage/metrics, checkpoint-resume) is format-agnostic —
``run_pipeline`` only sees a DataFrame with the transcript schema.

Partition pruning note for 100 TB: pass ``where`` (e.g. a ts-range or
conv-bucket predicate) so the filter reaches the source scan — Iceberg
prunes manifests/files by partition stats, Parquet by row-group stats;
both show up as PushedFilters in .explain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# the input_hint schema, as a StructType: JSONL reads MUST pass this
# explicitly — schema inference on json is a full extra pass over the
# dataset before the real read (at 100 TB, twice the scan cost, and a
# single odd row can flip a column type under the whole job)
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def resolve_transcript_format(source: str) -> str:
    """``format="auto"`` resolution: the suffix rule runs FIRST — a bare
    relative filename like ``dump.jsonl`` contains a dot but no slash
    and must not route to the iceberg table-name rule."""
    if source.rstrip("/").endswith((".jsonl", ".json")):
        return "jsonl"
    if "." in source and "/" not in source:
        return "iceberg"
    return "parquet"


def _validate(df: DataFrame, source: str) -> DataFrame:
    missing = [c for c in TRANSCRIPT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"{source} is not a transcript table: missing columns {missing}"
            f" (need {TRANSCRIPT_COLUMNS})"
        )
    return df.select(*TRANSCRIPT_COLUMNS)


def read_transcripts(
    spark: SparkSession,
    source: str,
    format: str = "auto",
    where: str | None = None,
    json_mode: str = "FAILFAST",
) -> DataFrame:
    """Load a transcript table.

    format:
      - "iceberg": ``source`` is a catalog table name (``cat.db.tbl``) or
        a path; requires the Iceberg Spark runtime on the classpath.
      - "parquet": ``source`` is a path.
      - "jsonl": ``source`` is a path of newline-delimited JSON (the
        interchange format transcripts usually arrive in); read with the
        explicit ``TRANSCRIPT_SCHEMA`` (no inference pass) in FAILFAST
        mode — a malformed line fails the job loudly instead of
        silently nulling a column. Pass ``json_mode="PERMISSIVE"`` to
        tolerate bad lines (they surface as all-null rows) when
        quarantining is handled downstream.
      - "auto": dotted non-path names -> iceberg table; ``.jsonl`` /
        ``.json`` paths -> jsonl; else parquet path.
    ``where`` is applied immediately so predicate pushdown reaches the
    source scan (partition/manifest pruning at scale; for jsonl only
    non-parsed pruning such as file listing applies — convert to
    parquet/iceberg before iterating on 100 TB).
    """
    if format == "auto":
        format = resolve_transcript_format(source)
    if format == "jsonl":
        df = (
            spark.read.schema(TRANSCRIPT_SCHEMA)
            .option("mode", json_mode)
            .json(source)
        )
    elif format == "iceberg":
        try:
            if "/" in source:
                df = spark.read.format("iceberg").load(source)
            else:
                df = spark.read.table(source)
        except Exception as e:  # noqa: BLE001 — missing runtime / table
            raise RuntimeError(
                "Iceberg read failed — is the iceberg-spark-runtime jar on"
                " the classpath and the catalog configured?"
                f" (source={source!r})"
            ) from e
    elif format == "parquet":
        df = spark.read.parquet(source)
    else:
        raise ValueError(f"unknown transcript format: {format!r}")
    df = _validate(df, source)
    if where:
        df = df.filter(where)
    return df


def write_transcripts_jsonl(df: DataFrame, dest: str) -> None:
    """Export transcripts as newline-delimited JSON (the interchange
    format for handing data to non-Spark consumers). Timestamps are
    serialized in Spark's default ISO-8601 form, which
    ``read_transcripts(..., format="jsonl")`` round-trips through
    ``TRANSCRIPT_SCHEMA``. JSONL is ~3-5x larger than parquet and has
    no column pruning or row-group stats — an exchange format, not a
    working format; keep the working copies in parquet/iceberg."""
    df.select(*TRANSCRIPT_COLUMNS).write.mode("overwrite").json(dest)


def write_assessments(
    df: DataFrame,
    dest: str,
    format: str = "parquet",
    partition_by: str = "partition_id",
) -> None:
    """Write assessed turns partitioned by the hash bucket (the same
    layout run_pipeline commits wave-by-wave); iceberg writes use the V2
    ``writeTo`` API when the runtime is present."""
    if format == "iceberg":
        try:
            df.writeTo(dest).partitionedBy(df[partition_by]).createOrReplace()
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                "Iceberg write failed — is the iceberg-spark-runtime jar on"
                f" the classpath? (dest={dest!r})"
            ) from e
    elif format == "parquet":
        df.write.mode("overwrite").partitionBy(partition_by).parquet(dest)
    else:
        raise ValueError(f"unknown output format: {format!r}")


def write_transcripts_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 64,
) -> None:
    """Persist a transcript table BUCKETED by conv_id and sorted by
    (conv_id, turn_idx) — the co-location layout for conversation-level
    work. Every downstream conv-keyed operation (per-conversation
    rollups, session windows, conversation dedup, the stable-order
    window itself) then reads data already hash-partitioned on conv_id:
    Spark elides the Exchange entirely (plan-asserted in
    tests/test_io.py). At 10^12 turns this converts the pipeline's
    dominant shuffle into a free property of the storage layout — the
    Parquet/managed-table analog of an Iceberg bucket partition
    transform (``bucket(N, conv_id)``).

    ``n_buckets`` should be sized so one bucket (total_rows/n_buckets)
    fits an executor's working memory; buckets are the unit of read
    parallelism for bucketed scans.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def read_transcripts_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed transcript table (bucket metadata comes from the
    catalog — reading the bare parquet path would silently drop the
    co-location guarantee, so always go through the table name)."""
    return _validate(spark.read.table(table), table)
