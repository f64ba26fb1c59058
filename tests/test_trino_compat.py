"""Trino-dialect shim tests (functions/trino_compat.py) — each shim's
Trino semantics pinned against literal expected values, plus the
JVM-only guarantee (no shim may plan a Python UDF)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from okera_trino_spark.functions import trino_compat as tc


@pytest.fixture(scope="module")
def one(spark):
    return spark.createDataFrame(
        [("hello world", '{"a": {"b": 7}, "arr": [1, 2]}')], "s string, j string")


def _val(df, col):
    return df.select(col.alias("v")).collect()[0].v


def test_strpos_is_one_based_zero_if_absent(one):
    assert _val(one, tc.strpos("s", "world")) == 7
    assert _val(one, tc.strpos("s", "xyz")) == 0


def test_date_add_general_units_preserve_timestamp(one):
    ts = F.lit("2024-01-31 10:00:00").cast("timestamp_ntz")
    assert str(_val(one, tc.date_add("month", 1, ts))) == "2024-02-29 10:00:00"
    assert str(_val(one, tc.date_add("hour", -10, ts))) == "2024-01-31 00:00:00"
    with pytest.raises(ValueError, match="unit"):
        tc.date_add("fortnight", 1, ts)
    with pytest.raises(TypeError):
        tc.date_add("day", F.lit(1), ts)


def test_date_diff_whole_units_end_minus_start(one):
    s = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    e = F.lit("2024-03-01 12:00:00").cast("timestamp_ntz")
    assert _val(one, tc.date_diff("month", s, e)) == 2
    assert _val(one, tc.date_diff("day", e, s)) == -60  # signed


def test_date_trunc_passthrough_with_unit_check(one):
    ts = F.lit("2024-06-15 13:45:57").cast("timestamp_ntz")
    assert str(_val(one, tc.date_trunc("hour", ts))) == "2024-06-15 13:00:00"
    with pytest.raises(ValueError):
        tc.date_trunc("millenium", ts)


def test_json_extract_scalar_and_subtree(one):
    assert _val(one, tc.json_extract_scalar("j", "$.a.b")) == "7"
    assert _val(one, tc.json_extract("j", "$.arr")) == "[1,2]"
    assert _val(one, tc.json_extract_scalar("j", "$.missing")) is None


def test_cardinality_contains_if(spark):
    df = spark.createDataFrame([([1, 2, 3],)], "arr array<int>")
    assert _val(df, tc.cardinality("arr")) == 3
    assert _val(df, tc.contains(F.col("arr"), 2)) is True
    assert _val(df, tc.if_(F.lit(False), F.lit("a"), F.lit("b"))) == "b"
    assert _val(df, tc.if_(F.lit(False), F.lit("a"))) is None


def test_listagg_is_sorted_and_deterministic(spark):
    df = spark.createDataFrame([("b",), ("c",), ("a",)], "x string") \
        .repartition(3)  # partition order must not matter
    assert df.agg(tc.listagg("x", "|").alias("v")).collect()[0].v == "a|b|c"


def test_approx_distinct_rsd_plumbs_through(spark):
    df = spark.range(0, 1000)
    n = df.agg(tc.approx_distinct("id", 0.01).alias("v")).collect()[0].v
    assert abs(n - 1000) <= 3 * 0.01 * 1000


def test_reference_udf_and_no_python_in_shims(spark, one):
    tc.register_reference_udfs(spark, "okera")
    assert spark.sql("SELECT okera_current_database() AS d").collect()[0].d == "okera"
    # every shim compiles to JVM expressions — no BatchEvalPython
    ts = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    df = one.select(
        tc.strpos("s", "o"), tc.date_add("day", 1, ts),
        tc.date_diff("hour", ts, ts), tc.date_trunc("day", ts),
        tc.json_extract_scalar("j", "$.a.b"))
    assert "BatchEvalPython" not in df._jdf.queryExecution().executedPlan().toString()
