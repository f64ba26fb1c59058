"""Physical-plan contract tests — the 100-TB discipline, enforced.

Correctness says the operator works at sf0.001; these tests say the
*plan* is the one that survives 1000 executors and 100 TB: filters
pushed to parquet row groups, projections pruned to the read schema,
small dims broadcast instead of shuffled.
"""

from __future__ import annotations

from okera_trino_spark.plans import assert_plan_contains, assert_pushed_filters, plan_string
from okera_trino_spark.registry import load_all_queries

SPECS = load_all_queries()


def test_filter_range_pushed_to_scan(spark, sf_dir):
    df = SPECS["q_filter_range"].fn(spark, sf_dir)
    assert_pushed_filters(df, "l_discount", "l_quantity", "l_shipdate")


def test_projection_prunes_read_schema(spark, sf_dir):
    df = SPECS["q_project"].fn(spark, sf_dir)
    plan = plan_string(df, "formatted")
    # ReadSchema must contain only referenced columns — no l_shipdate etc.
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    blob = "\n".join(read)
    assert "l_extendedprice" in blob
    assert "l_shipdate" not in blob and "l_returnflag" not in blob


def test_flagship_is_partial_final_hash_agg(spark, sf_dir):
    # Map-side combine (partial_sum) before the exchange — the shape that
    # keeps the shuffle tiny at 100 TB (3x2 group keys, not 6B rows).
    df = SPECS["q_pricing_summary"].fn(spark, sf_dir)
    assert_plan_contains(df, "HashAggregate", "partial_sum")


def test_count_star_reads_no_columns(spark, sf_dir):
    df = SPECS["q_count_star"].fn(spark, sf_dir)
    plan = plan_string(df, "formatted")
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "struct<>" in read[0], plan


def test_limit_is_take_ordered(spark, sf_dir):
    df = SPECS["q_limit"].fn(spark, sf_dir)
    assert_plan_contains(df, "TakeOrderedAndProject")
