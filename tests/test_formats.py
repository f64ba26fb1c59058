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
