"""Shared helpers for query implementations."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.sources.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table. Plain parquet scan; Catalyst owns pushdown."""
    return load_table(spark, sf_dir, name)


def r4(col: Column | str) -> Column:
    """Round a double aggregate to 4 decimals.

    Parallel floating-point aggregation is order-dependent in the last
    bits; both Spark and the DuckDB oracle round identically so the
    driver's value hash is stable. 4 decimals leaves ~10 guard digits at
    fixture magnitudes (sums ≤ 1e9).
    """
    return F.round(col if isinstance(col, Column) else F.col(col), 4)


def spread_if_narrow(df: DataFrame, spark: SparkSession,
                     factor: int = 2) -> DataFrame:
    """Round-robin repartition ``df`` ONLY when its scan yields fewer
    partitions than the cluster can use — the balancing move for
    compute-amplified map stages (e.g. winnowing's ~40 hashes per input
    byte), where Spark's byte-based split sizing under-parallelizes
    small or few-file inputs.

    The condition is the point: on a production layout (100 TB = ~10^5
    splits >> cores) this is a NO-OP — no shuffle is ever added to a
    well-partitioned input, because shuffling raw bytes purely to
    rebalance a map stage costs more than it saves once every core
    already has work. The narrow case (one small file, local fixtures,
    a coalesced upstream) is exactly where the shuffle is cheap (few
    bytes) and the win is large (idle cores). getNumPartitions reads
    the planned partitioning — no job runs.
    """
    target = spark.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
