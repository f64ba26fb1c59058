"""AQE runtime-adaptivity evidence — skew-join splitting and partition
coalescing, exercised on purpose-built skewed data.

The engine's 100-TB posture for skew is two-layered: explicit salting
where the skew is known (`q_agg_salted`, operators/skew.py) and AQE
skew-join splitting for skew discovered at runtime. The fixtures are
too small/uniform to ever trip AQE, so this test manufactures a skewed
join (one key carrying ~100x the others) with thresholds scaled down to
fixture size, and asserts the executed plan actually split the skewed
partition (`skew=true`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def aqe_skew_confs(spark):
    """Scale AQE's skew thresholds down to test-sized data; restore after."""
    keys = [
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, aqe_skew_confs):
    """A join where one key carries ~100x the rows of every other must
    execute with AQE's skew split (skew=true in the final SMJ) — the
    runtime re-plan the engine relies on for skew it didn't salt."""
    skewed = spark.range(0, 200_000).select(
        F.when(F.col("id") % 3 != 0, F.lit(0))  # key 0 ≈ 2/3 of all rows
         .otherwise((F.col("id") % 50) + 1).alias("k"),
        F.col("id").alias("payload"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"))
    # one row per key: join multiplicity stays 1, skew lives on the left
    other = spark.range(0, 51).select(
        F.col("id").alias("k"), F.col("id").alias("rhs"))
    joined = skewed.join(other, "k").select("k", "payload", "rhs", "pad")
    # collect() executes THIS Dataset's own QueryExecution (count() would
    # build a new pruned one), so the adaptive plan below is final.
    rows = joined.collect()
    assert len(rows) > 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "skew=true" in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_aqe_coalesces_tiny_shuffle_partitions(spark, aqe_skew_confs):
    """The inverse adaptivity: a tiny aggregate over 32 configured
    shuffle partitions must coalesce to far fewer actual partitions —
    the mechanism that keeps task counts sane when a filter collapses
    data volume mid-query."""
    df = spark.range(0, 1_000).groupBy((F.col("id") % 7).alias("g")).count()
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan
