"""Source/sink formats beyond parquet.

The reference connector reads exactly one source — the Okera worker
wire protocol (RecordServiceUtil.java:62-164) — and its deployments
front parquet/ORC/CSV data lakes behind that RPC. A Spark-first engine
exposes the lake formats directly through the DataSource API: the same
vectorized scan, pushdown, and split planning apply to every format
Spark ships (parquet, ORC, CSV, JSON, text), and sinks are the write
half of the same API.

These helpers pin the engine's conventions (header/schema handling,
compression, mode) so every caller reads/writes identically; they are
deliberately thin — format plumbing belongs to Spark, conventions to
the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Formats the engine supports for both read and write.
FORMATS = ("parquet", "orc", "csv", "json")

#: zstd for columnar formats (matches the engine's shuffle codec);
#: gzip for the text formats where zstd support varies by Hadoop build.
_WRITE_COMPRESSION = {
    "parquet": "zstd",
    "orc": "zstd",
    "csv": "gzip",
    "json": "gzip",
}


def read_source(spark: SparkSession, fmt: str, path: str,
                schema: str | None = None) -> DataFrame:
    """Read ``path`` as ``fmt``. CSV/JSON take an explicit DDL schema —
    at 100 TB schema inference is a full extra pass over the data, so
    the engine requires the caller (or the catalog) to supply one;
    parquet/ORC carry their schema in file metadata."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} reads require an explicit schema "
                             "(inference is a full data pass)")
        reader = reader.schema(schema)
    elif schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_sink(df: DataFrame, fmt: str, path: str, mode: str = "overwrite",
               partition_by: list[str] | None = None) -> None:
    """Write ``df`` to ``path`` as ``fmt``. ``partition_by`` produces
    hive-style directory partitioning — the layout that gives 100-TB
    readers partition pruning for free."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = (
        df.write.format(fmt).mode(mode)
        .option("compression", _WRITE_COMPRESSION[fmt])
    )
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed_table(df: DataFrame, table: str, bucket_cols: list[str],
                         n_buckets: int, sort_cols: list[str] | None = None) -> None:
    """Persist as a bucketed managed table: co-locates both sides of a
    repeated equi-join/aggregation on ``bucket_cols`` so the join runs
    shuffle-free (SCALE.md, joins section). Bucketing is the deployment
    answer for fact⋈fact joins; it requires saveAsTable (metastore
    bookkeeping), not a bare directory write."""
    writer = df.write.format("parquet").mode("overwrite") \
        .bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
