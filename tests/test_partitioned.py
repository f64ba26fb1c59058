"""Partitioned / multi-file scan evidence — partition pruning, dynamic
partition pruning (DPP), and split parallelism.

Every shipped fixture is ONE parquet file with ONE row group, so the
scan paths that matter most at 100 TB — partition-directory pruning,
runtime (dynamic) filters from a dimension join, multi-split scans —
are never exercised by the oracle keys. These tests write a partitioned
copy of ``orders`` (by o_orderdate year) into a tmpdir and pin the plan
contracts directly.

Reference gesture: the connector RECEIVES dynamic filters through the
Trino SPI and ignores them (RecordServiceSplitManagerImpl.java:238);
Spark's DPP actually implements that optimization — asserted here.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from okera_trino_spark.plans import plan_string
from okera_trino_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def orders_by_year(spark, sf_dir, tmp_path_factory) -> str:
    """Orders partitioned by order year — a real multi-directory,
    multi-file layout (7 year partitions at every SF)."""
    path = str(tmp_path_factory.mktemp("part") / "orders_by_year")
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year").mode("overwrite").parquet(path)
    )
    return path


@pytest.fixture(scope="module")
def year_dim(spark, orders_by_year, tmp_path_factory) -> str:
    """A tiny year-attribute dimension ON DISK (DPP needs a filterable
    relation on the build side, not an inline LocalRelation)."""
    path = str(tmp_path_factory.mktemp("part") / "year_dim")
    years = [(y, "hot" if y == 1995 else "cold") for y in range(1992, 1999)]
    spark.createDataFrame(years, "o_year int, temperature string") \
        .coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_partition_filter_prunes_directories(spark, orders_by_year):
    """A filter on the partition column must become a PartitionFilter
    (directory pruning — never reads the other years' files), NOT a
    post-scan Filter or a pushed data filter."""
    df = spark.read.parquet(orders_by_year).filter(F.col("o_year") == 1995)
    plan = plan_string(df, "formatted")
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    assert "o_year" in pf[0] and "1995" in pf[0], plan
    # and the pruned scan reads only the 1995 partition's rows
    full = spark.read.parquet(orders_by_year)
    expect = full.where(F.col("o_year") == 1995).count()
    assert df.count() == expect > 0


def test_dim_filter_plans_dynamic_partition_pruning(spark, orders_by_year, year_dim):
    """The 100-TB star-join contract: a selective filter on the year
    dimension must reach the FACT scan as a runtime partition filter
    (dynamicpruningexpression) — only the matching year directories are
    read, decided at execution time from the broadcast dim."""
    fact = spark.read.parquet(orders_by_year)
    dim = spark.read.parquet(year_dim).filter(F.col("temperature") == "hot")
    joined = fact.join(dim, "o_year").select("o_orderkey", "o_totalprice", "o_year")
    plan = plan_string(joined, "formatted")
    assert "dynamicpruning" in plan.lower(), plan
    rows = joined.count()
    expect = fact.where(F.col("o_year") == 1995).count()
    assert rows == expect > 0


def test_partitioned_layout_yields_multiple_splits(spark, orders_by_year):
    """Split planning: the partitioned layout is multiple files, and the
    unfiltered scan plans more than one input partition (the shipped
    single-file fixtures never exercise this)."""
    n_files = sum(
        1 for root, _, files in os.walk(orders_by_year)
        for f in files if f.endswith(".parquet"))
    assert n_files >= 5, f"expected multi-file layout, got {n_files} files"
    df = spark.read.parquet(orders_by_year)
    assert df.rdd.getNumPartitions() > 1
