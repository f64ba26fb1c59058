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
