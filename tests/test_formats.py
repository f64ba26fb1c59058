"""Source/sink format roundtrips: every supported format must carry a
table through write → read unchanged (modulo the format's own type
limits: CSV/JSON are text formats, so temporal/complex columns are
projected out before the text roundtrips).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from okera_trino_spark.sources.catalog import load_table
from okera_trino_spark.sources.formats import FORMATS, read_source, write_sink


@pytest.fixture()
def tmp_out():
    d = tempfile.mkdtemp(prefix="fmt_roundtrip_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip(spark, sf_dir, fmt, tmp_out):
    df = load_table(spark, sf_dir, "nation")
    schema = "n_nationkey INT, n_name STRING, n_regionkey INT"
    write_sink(df, fmt, f"{tmp_out}/nation_{fmt}")
    back = read_source(spark, fmt, f"{tmp_out}/nation_{fmt}",
                       schema=schema if fmt in ("csv", "json") else None)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_sink_prunes(spark, sf_dir, tmp_out):
    """Hive-style partitioning: a filter on the partition column must
    plan as partition pruning (scan reads one directory)."""
    df = load_table(spark, sf_dir, "orders")
    write_sink(df, "parquet", f"{tmp_out}/orders_part", partition_by=["o_orderstatus"])
    back = read_source(spark, "parquet", f"{tmp_out}/orders_part")
    only_f = back.filter("o_orderstatus = 'F'")
    plan = only_f._jdf.queryExecution().executedPlan().toString()
    assert only_f.count() == df.filter("o_orderstatus = 'F'").count()
    # Partition filters appear in the scan node, not as a post-filter.
    assert "PartitionFilters" in plan


def test_csv_requires_schema(spark, tmp_out):
    with pytest.raises(ValueError, match="schema"):
        read_source(spark, "csv", tmp_out)


def test_bad_format_rejected(spark, tmp_out):
    with pytest.raises(ValueError, match="unsupported"):
        read_source(spark, "avro", tmp_out)


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """The 100-TB fact⋈fact answer: both sides bucketed on the join key
    → SortMergeJoin with NO Exchange on either side (broadcast disabled
    to prove it's the bucketing, not dim-size, that removes the
    shuffle). SCALE.md joins section documents this as the deployment
    strategy for repeated orderkey joins."""
    from okera_trino_spark.sources.formats import write_bucketed_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(o, "b_orders", ["o_orderkey"], 8,
                         sort_cols=["o_orderkey"])
    write_bucketed_table(li, "b_lineitem", ["l_orderkey"], 8,
                         sort_cols=["l_orderkey"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        expect = (o.join(li, o.o_orderkey == li.l_orderkey)).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
