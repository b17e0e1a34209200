"""Scale-behavior evidence tests: AQE skew handling and salted-shuffle
properties that only show up under deliberately skewed inputs. These are
the local-mode stand-ins for cluster behavior the north rule targets
(skewed conversation partitions, runtime re-planning)."""

import io
from contextlib import redirect_stdout

import pandas as pd
import pytest


def _final_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_aqe_splits_skewed_join_partition(spark):
    """A join where one conversation owns ~95% of the fact rows must be
    rescued by AQE's skew-join split at runtime: after execution the
    final adaptive plan marks the SortMergeJoin with skew=true. This is
    the runtime complement to the engine's PROACTIVE salting
    (conversation_stats): salting removes known hot keys before the
    shuffle; AQE re-plans the residual skew the static plan can't see."""
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    try:
        # force a sort-merge join and make the skew detector sensitive
        # enough to fire on local-mode data volumes
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16384",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384"
        )
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        # incompressible payloads: a constant pad shuffle-compresses to
        # nothing and the size-based skew detector never fires
        import random

        rng = random.Random(7)
        fact = pd.DataFrame(
            {
                "conv_id": ["conv-hot"] * 20000
                + [f"conv-{i % 40}" for i in range(1000)],
                "payload": [
                    "".join(chr(rng.randrange(33, 127)) for _ in range(120))
                    for _ in range(21000)
                ],
            }
        )
        dim = pd.DataFrame(
            {
                "conv_id": ["conv-hot"] + [f"conv-{i}" for i in range(40)],
                "team": ["t%d" % (i % 3) for i in range(41)],
            }
        )
        joined = spark.createDataFrame(fact).join(
            spark.createDataFrame(dim), on="conv_id"
        )
        # the action must run THIS DataFrame's query execution (a noop
        # write or a count() builds a separate execution whose adaptive
        # plan the DataFrame never sees), and must not prune the payload
        # column (pruning shrinks the shuffle below the skew threshold)
        assert len(joined.collect()) == 21000
        plan = _final_plan(joined)
        assert "skew=true" in plan, plan  # AQE split the hot partition
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
