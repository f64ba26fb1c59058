"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``okera_trino_spark.registry`` — the package's central
query registry is the single source of truth; each registered operator
key carries both its Spark callable and its DuckDB oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from okera_trino_spark.registry import load_all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    specs = load_all_queries()
    return specs["q_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator key from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per key; keys without an oracle are
    omitted (driver records the weaker rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in load_all_queries().items()
        if spec.oracle is not None
    }
