"""Scan-layer operators — SURVEY.md §2.1 C1–C7.

The reference implements these in its connector (split planning +
columnar decode + pushdown rendering); in Spark each is a declarative
DataFrame transform that Catalyst pushes into the vectorized parquet
scan. Tests assert the pushdown actually happened (PushedFilters /
ReadSchema in the physical plan) — see tests/test_plans.py.

Reference citations:
- scan / splits: RecordServiceSplitManagerImpl.java:236-284
- projection pushdown: RecordServiceSplitManagerImpl.java:245-260
- predicate conjuncts (ranges, IN, IS NULL): RecordServiceSplitManagerImpl.java:302-408
- limit pushdown: RecordServiceSplitManagerImpl.java:270-282
- count(*) fast path: RecordServicePageSource.java:79-83,96-103
- byte-sampled catalogs: RecordServiceConfig.java:404-422
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → filter → group agg → sort.

    Exercises the main reference path end-to-end (C1 scan, C4 predicate
    pushdown, E7 hash aggregate, E17 sort) in one query. The filter is
    pushed to parquet row groups; the aggregation is partial (map-side)
    then final after a 3-partition-key shuffle; the tiny grouped result
    sorts without a range shuffle.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


FLAGSHIP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                           AS sum_qty,
       round(sum(l_extendedprice), 4)                                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)                   AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)     AS sum_charge,
       round(avg(l_quantity), 4)                                           AS avg_qty,
       round(avg(l_extendedprice), 4)                                      AS avg_price,
       round(avg(l_discount), 4)                                           AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

query("q_pricing_summary", oracle=FLAGSHIP_ORACLE, tags=("scan", "agg", "flagship"))(flagship)


@query("q_scan_full", oracle="SELECT * FROM region", tags=("scan",))
def q_scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 full table scan (all columns, all rows) of a small table.

    At 100 TB a full scan is a pipelined parquet read with no shuffle —
    the plan here is a single ColumnarToRow over the file scan.
    """
    return t(spark, sf_dir, "region")


@query(
    "q_scan_wide",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
           l_tax, l_returnflag, l_linestatus,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    """,
    tags=("scan",),
)
def q_scan_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C8 wide scan of the fact table (columnar decode of every type).

    Convention used across the whole registry: temporal output columns
    are rendered as ISO strings in BOTH engines so the driver's value
    hash never depends on pandas datetime normalization.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


@query(
    "q_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    """,
    tags=("scan",),
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 projection pushdown: 3-column read of an 11-column table.

    The physical plan's ReadSchema must contain only the 4 referenced
    columns — Catalyst column pruning standing in for the reference's
    createProjectionRequest (RecordServiceSplitManagerImpl.java:245-260).
    """
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
    )


@query(
    "q_filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    tags=("scan", "filter"),
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 range-predicate pushdown (the reference's toPredicate range
    rendering, RecordServiceSplitManagerImpl.java:338-408). All four
    conjuncts are parquet-pushable min/max row-group filters."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "q_filter_in",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    tags=("scan", "filter"),
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 IN-list pushdown (reference renders IN conjuncts,
    RecordServiceSplitManagerImpl.java:384-395)."""
    orders = t(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "q_filter_null",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE nullif(c_mktsegment, 'MACHINERY') IS NOT NULL
      AND nullif(c_acctbal, 0.0) IS NOT NULL
    """,
    tags=("scan", "filter"),
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 NULL-test predicates (reference: IS NULL rendering,
    RecordServiceSplitManagerImpl.java:396-403). Fixtures contain no
    physical NULLs, so nulls are synthesized with nullif to make the
    three-valued logic observable."""
    cust = t(spark, sf_dir, "customer")
    return cust.filter(
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).isNotNull()
        & F.nullif(F.col("c_acctbal"), F.lit(0.0)).isNotNull()
    ).select("c_custkey", "c_acctbal")


@query(
    "q_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
    tags=("scan", "limit"),
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 limit pushdown. Ordered so the result set is deterministic;
    Catalyst compiles this to TakeOrderedAndProject (per-partition top-K,
    no global sort) — the scale-safe form of ORDER BY + LIMIT."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@query("q_count_star", oracle="SELECT count(*) AS cnt FROM lineitem", tags=("scan", "agg"))
def q_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 count(*) fast path: Spark answers from parquet footer row
    counts without materializing columns (the reference synthesizes a
    BIGINT column worker-side, RecordServicePageSource.java:79-83)."""
    return t(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


@query(
    "q_sample",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem LIMIT 1000
    """,
    tags=("scan", "sample"),
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 sampled scan (okera_sampled_* catalogs) in the BYTE-EXACT
    prefix mode — the reference's actual semantics: scan up to
    sample_max_data_size uncompressed bytes and stop
    (RecordServiceConfig.java:404-422). The byte cap is derived from
    the parquet footer's per-row-group byte/row accounting so the
    prefix lands on exactly 1000 rows, making the row SET deterministic
    and DuckDB-reproducible (LIMIT n over the same single-file order) —
    a hard hash oracle for the sampling machinery, not a rows-only
    check. The resulting df.limit(n) is a PUSHED limit: Spark stops
    scanning once n rows are produced, so the cap governs bytes read.

    The fraction mode (Bernoulli row sample, the okera_sampled_*
    approximation) stays covered by the 5-sigma binomial bounds test in
    tests/test_bounds.py — which rows a seeded Bernoulli keeps is
    engine-specific by nature."""
    import pyarrow.parquet as pq

    from okera_trino_spark.sources.catalog import GovernedCatalog, table_path

    rg = pq.read_metadata(table_path(sf_dir, "lineitem")).row_group(0)
    avg = rg.total_byte_size / rg.num_rows
    cat = GovernedCatalog(spark, sf_dir, sample_bytes=int(1000.5 * avg),
                          sample_mode="prefix")
    return cat.read("lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity")
