"""Training-data ops: ANN LSH, multimodal plumbing, entry contract."""

import numpy as np
import pytest


def test_ann_lsh_topk_subset_of_bruteforce(spark):
    from lingua_spark.ops.queries import SQL_QUERIES, register_views
    from lingua_spark.ops.similarity import ann_lsh_topk

    sf = "/root/testdata/sf0.001"
    register_views(spark, sf)
    brute = spark.sql(SQL_QUERIES["sim_cosine_topk"][0]).toPandas()
    ann = ann_lsh_topk(spark, sf).toPandas()
    assert set(ann.columns) == {"query_id", "neighbor_id", "cosine", "rank"}
    # every ANN hit must be a real pair with the same cosine as brute force
    brute_scores = {
        (r.query_id, r.neighbor_id): r.cosine for r in brute.itertuples()
    }
    checked = 0
    for r in ann.itertuples():
        if (r.query_id, r.neighbor_id) in brute_scores:
            assert brute_scores[(r.query_id, r.neighbor_id)] == pytest.approx(
                r.cosine, abs=1e-4
            )
            checked += 1
    assert checked > 0  # buckets recall at least part of the true top-k


def test_multimodal_feature_plumbing(spark):
    from lingua_spark.ops.multimodal import (
        FEATURE_DIM,
        decode_real,
        extract_features,
        synth_media,
    )

    media = synth_media(spark, n=32)
    feats = extract_features(media).toPandas()
    assert len(feats) == 32
    assert all(len(f) == FEATURE_DIM for f in feats.feature)
    # deterministic: same payload -> same feature
    again = extract_features(media).toPandas()
    assert feats.sort_values("media_id").payload_sha.tolist() == \
        again.sort_values("media_id").payload_sha.tolist()
    with pytest.raises(NotImplementedError):
        decode_real(b"x", "image/png")


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # non-SQL queries present but without oracle (weaker rows-only check)
    assert "detect_language_counts" in q and "detect_language_counts" not in o
    # spot-run one query
    out = q["dedup_exact"](spark, "/root/testdata/sf0.001").toPandas()
    assert {"text_key", "keep_doc_id", "dup_count"} == set(out.columns)


def test_streaming_available_now(spark, tmp_path):
    from lingua_spark.corpus import transcripts
    from lingua_spark.streaming import run_stream_once

    pdf = transcripts(n_turns=60)
    src = tmp_path / "in"
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src))
    outd = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    run_stream_once(spark, str(src), str(outd), str(ckpt))
    got = spark.read.parquet(str(outd))
    assert got.count() == len(pdf)
    assert {"conv_id", "lang", "keep", "scrubbed_text"} <= set(got.columns)
    # restart with no new data processes nothing new but succeeds
    run_stream_once(spark, str(src), str(outd), str(ckpt))
    assert spark.read.parquet(str(outd)).count() == len(pdf)


def test_stateful_conversation_tracker(spark, tmp_path):
    import pandas as pd

    from lingua_spark.streaming import stateful_conversation_tracker

    # conversation with a run of droppable turns
    rows = []
    for i, text in enumerate(
        ["the people of the year would have time", "!!!", "???", "...",
         "another good turn with many words here"]
    ):
        rows.append(("c1", i, "user", text, "", pd.Timestamp("2025-01-01")
                     + pd.Timedelta(minutes=i)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"]).astype({"turn_idx": "int32"})
    src = tmp_path / "in"
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src))
    out = stateful_conversation_tracker(spark, str(src))
    q = (out.writeStream.format("memory").queryName("convtrack")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("select * from convtrack").toPandas()
    assert len(got) >= 1
    final = got.iloc[-1]
    assert final.turns == 5
    assert final.dropped == 3
    # streak broke on the last good turn
    assert final.drop_streak == 0
    assert not final.quarantined


def test_unload_models(spark):
    from lingua_spark.engine.udfs import make_detect_udf, unload_models

    make_detect_udf(spark)
    assert unload_models(spark) >= 1
    assert unload_models(spark) == 0
