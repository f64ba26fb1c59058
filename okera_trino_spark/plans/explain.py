"""Physical-plan inspection helpers.

Used by tests to enforce the scale contract: filters reach the parquet
scan (``PushedFilters``), projections prune the read schema
(``ReadSchema``), small dims broadcast (``BroadcastHashJoin``), and hot
paths stay inside whole-stage codegen. The reference implements pushdown
by rendering SQL conjuncts into its planner request
(RecordServiceSplitManagerImpl.java:302-408); in Spark the same intent is
verified by reading the optimized physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """Return ``df.explain(mode)`` output as a string (PySpark prints it)."""
    jdf = df._jdf  # classic (non-Connect) local mode
    sess = df.sparkSession
    return sess._jvm.PythonSQLUtils.explainString(jdf.queryExecution(), mode)


def assert_plan_contains(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = plan_string(df, mode)
    for needle in needles:
        assert needle in plan, f"plan missing {needle!r}:\n{plan}"
    return plan


def assert_pushed_filters(df: DataFrame, *column_names: str) -> str:
    """Assert the scan node reports pushed filters on the given columns."""
    plan = plan_string(df, "formatted")
    assert "PushedFilters" in plan, f"no PushedFilters in plan:\n{plan}"
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    blob = "\n".join(pushed)
    for col in column_names:
        assert col in blob, f"filter on {col!r} not pushed:\n{blob}"
    return plan
