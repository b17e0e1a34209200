"""Transcript I/O (Iceberg-or-Parquet) + spark-submit CLI surface."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

from lingua_spark.corpus import transcripts
from lingua_spark.io import read_transcripts, write_assessments

REPO = Path(__file__).resolve().parent.parent


def _write_input(spark, tmp_path, n=120):
    pdf = transcripts(n_turns=n)
    src = tmp_path / "in.parquet"
    spark.createDataFrame(pdf).write.parquet(str(src))
    return src, pdf


def test_read_transcripts_parquet_and_pushdown(spark, tmp_path):
    src, pdf = _write_input(spark, tmp_path)
    df = read_transcripts(spark, str(src), "auto")
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df.count() == len(pdf)
    filtered = read_transcripts(
        spark, str(src), "parquet", where="turn_idx < 2"
    )
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "turn_idx" in plan
    assert filtered.count() == (pdf.turn_idx < 2).sum()


def test_read_transcripts_schema_validation(spark, tmp_path):
    bad = tmp_path / "bad.parquet"
    spark.range(5).write.parquet(str(bad))
    with pytest.raises(ValueError, match="missing columns"):
        read_transcripts(spark, str(bad))


def test_read_transcripts_iceberg_degrades_clearly(spark):
    # no iceberg runtime in this container: the error must say so
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        read_transcripts(spark, "cat.db.transcripts", "iceberg")


def test_jsonl_roundtrip_and_failfast(spark, tmp_path):
    """JSONL export -> import round-trips every column (including the
    timestamp) through the explicit TRANSCRIPT_SCHEMA, with no
    inference pass; a malformed line fails loudly in FAILFAST mode and
    surfaces as an all-null row under PERMISSIVE."""
    from lingua_spark.io import write_transcripts_jsonl

    src, pdf = _write_input(spark, tmp_path, n=90)
    df = read_transcripts(spark, str(src))
    out = tmp_path / "export.jsonl"
    write_transcripts_jsonl(df, str(out))
    back = read_transcripts(spark, str(out), "auto")  # auto -> jsonl
    assert back.schema == df.schema  # explicit schema, not inferred
    key = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    want = df.toPandas().sort_values(key[:2]).reset_index(drop=True)[key]
    got = back.toPandas().sort_values(key[:2]).reset_index(drop=True)[key]
    assert got.equals(want)

    bad = tmp_path / "bad.jsonl"
    bad.write_text(
        '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi",'
        '"tool":null,"ts":"2026-01-01T00:00:00Z"}\n'
        "this is not json\n"
    )
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_transcripts(spark, str(bad), "jsonl").collect()
    perm = read_transcripts(spark, str(bad), "jsonl", json_mode="PERMISSIVE")
    rows = perm.collect()
    assert len(rows) == 2 and sum(r.conv_id is None for r in rows) == 1


def test_write_assessments_roundtrip(spark, tmp_path):
    from lingua_spark.engine.pipeline import assess_turns, with_stable_order

    src, pdf = _write_input(spark, tmp_path, n=60)
    df = read_transcripts(spark, str(src))
    assessed = assess_turns(spark, with_stable_order(df), None, 4)
    out = tmp_path / "out"
    write_assessments(assessed, str(out))
    got = spark.read.parquet(str(out))
    assert got.count() == len(pdf.drop_duplicates(["conv_id", "turn_idx"]))
    assert "partition_id" in got.columns


def test_submit_cli_end_to_end(spark, tmp_path):
    """scripts/run_pipeline.py driven exactly as spark-submit would drive
    it (fresh Python process, package shipped via ship_package), plus the
    --py-files zip builder."""
    src, pdf = _write_input(spark, tmp_path, n=80)
    out = tmp_path / "run"
    zip_out = tmp_path / "lingua_spark.zip"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "build_pyfiles.py"), str(zip_out)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0 and zip_out.exists()
    r = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "run_pipeline.py"),
            "--input", str(src), "--output", str(out),
            "--partitions", "4", "--waves", "2", "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=600, cwd="/tmp",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert sorted(summary["processed_partitions"]) == [0, 1, 2, 3]
    got = spark.read.parquet(str(out / "data"))
    assert got.count() == len(pdf.drop_duplicates(["conv_id", "turn_idx"]))


def test_bucketed_conv_rollup_needs_no_exchange(spark, tmp_path):
    """The co-location property the bucketed layout exists for: a
    conversation-level aggregation over the bucketed table must compile
    WITHOUT any shuffle (no Exchange in the plan), and a bucketed-to-
    bucketed conv-keyed join must also be Exchange-free — while both
    produce results identical to the plain-parquet path."""
    import io as _io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from lingua_spark.io import (
        read_transcripts_bucketed,
        write_transcripts_bucketed,
    )

    pdf = transcripts(n_turns=2000)
    df = spark.createDataFrame(pdf)
    spark.sql("DROP TABLE IF EXISTS t_bucketed")
    write_transcripts_bucketed(
        df, "t_bucketed", str(tmp_path / "t_bucketed"), n_buckets=8
    )
    bt = read_transcripts_bucketed(spark, "t_bucketed")

    def plan_of(qdf) -> str:
        buf = _io.StringIO()
        with redirect_stdout(buf):
            qdf.explain("formatted")
        return buf.getvalue()

    agg = bt.groupBy("conv_id").agg(
        F.count("*").alias("turns"), F.max("turn_idx").alias("last_turn")
    )
    p = plan_of(agg)
    assert "Exchange" not in p, p  # aggregation rides the bucket layout
    want = (
        df.groupBy("conv_id")
        .agg(F.count("*").alias("turns"), F.max("turn_idx").alias("last_turn"))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    got = agg.toPandas().sort_values("conv_id").reset_index(drop=True)
    assert got.equals(want)

    # bucketed-to-bucketed join on the bucket key: no shuffle either side
    joined = bt.alias("a").join(
        agg.alias("s"), on="conv_id"
    )
    pj = plan_of(joined)
    assert "Exchange" not in pj.replace("BroadcastExchange", ""), pj
    assert joined.count() == df.count()
    spark.sql("DROP TABLE IF EXISTS t_bucketed")


def test_resolve_transcript_format_routing():
    """format='auto' routing: suffix beats the dotted-table-name rule —
    a bare relative filename like 'dump.jsonl' must read as jsonl, not
    raise from the iceberg catalog path."""
    from lingua_spark.io import resolve_transcript_format as r

    assert r("dump.jsonl") == "jsonl"
    assert r("dump.json") == "jsonl"
    assert r("/data/in/part.jsonl") == "jsonl"
    assert r("s3a://bucket/day=1/file.jsonl/") == "jsonl"
    assert r("cat.db.transcripts") == "iceberg"
    assert r("/data/transcripts") == "parquet"
    assert r("relative_dir") == "parquet"
