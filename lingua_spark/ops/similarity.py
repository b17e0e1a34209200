"""Approximate nearest-neighbor search over the embeddings table.

Baseline: brute-force cosine top-k (SQL, ``sim_cosine_topk`` in
ops.queries — broadcast the small query side, score JVM-side with
higher-order array functions).

Scale path: random-hyperplane LSH — bucket vectors by the sign pattern of
dot products with P deterministic hyperplanes, then search only within the
query's bucket (plus optional multi-probe). At 100 TB the bucket join
replaces the cross join: candidates shrink by ~2^P while recall stays high
for near-duplicate retrieval. Hyperplanes are derived deterministically
from a seed so driver, executors, and tests agree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n_planes, dim))
    return (h / np.linalg.norm(h, axis=1, keepdims=True)).astype(np.float64)


def lsh_bucket_ann(
    spark: SparkSession,
    emb: DataFrame,
    n_planes: int = 12,
    topk: int = 3,
    n_query: int = 8,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed cosine top-k: same output shape as sim_cosine_topk but
    only pairs sharing an LSH bucket are scored (recall < 1 by design)."""
    from ..engine.udfs import ship_package

    ship_package(spark)
    planes = hyperplanes(dim, n_planes)
    bc = spark.sparkContext.broadcast(planes)

    @F.pandas_udf(LongType())
    def bucket_of(embs: pd.Series) -> pd.Series:
        pl = bc.value
        mat = np.stack(embs.to_numpy()).astype(np.float64)  # (batch, dim)
        signs = (mat @ pl.T) > 0  # (batch, P)
        weights = (1 << np.arange(pl.shape[0])).astype(np.int64)
        return pd.Series(signs @ weights)

    with_b = emb.withColumn("bucket", bucket_of(F.col("embedding")))
    q = with_b.filter(F.col("vec_id") < n_query).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    # broadcast the tiny query side; join on bucket prunes the candidates
    pairs = with_b.join(F.broadcast(q), on="bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    dot = F.aggregate(
        F.zip_with(
            "q_emb", "embedding", lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(dot / (norm("q_emb") * norm("embedding")), 4).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_bucket_ann(spark, emb)
