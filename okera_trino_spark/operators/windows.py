"""Window-function operators — SURVEY.md §2.2 E14–E16.

Engine-delegated in the reference (Trino 400 window machinery). Spark's
WindowExec shuffles once on PARTITION BY keys and sorts within
partitions — the scale contract is: always partition (an empty
PARTITION BY serializes the world through one task) and make ORDER BY
deterministic (unique tie-break key) so results are stable across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query


@query(
    "q_win_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14 ranking functions. ORDER BY carries c_custkey as a unique
    tie-break so row_number/ntile are deterministic."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_orderkey) OVER w AS first_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15 analytic offset functions over each customer's order history.

    Note: nth_value default frame (unbounded preceding → current row)
    matches between Spark and DuckDB; both return NULL before row 2.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "q_win_frame_rows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS running_spend,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg3
    FROM orders
    """,
    tags=("window",),
)
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16 ROWS frames: running total + 3-row moving average."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        r4(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))).alias("running_spend"),
        r4(F.avg("o_totalprice").over(w.rowsBetween(-2, Window.currentRow))).alias("moving_avg3"),
    )


@query(
    "q_win_frame_range",
    oracle="""
    SELECT p_partkey, p_brand, p_size,
           count(*) OVER (PARTITION BY p_brand ORDER BY p_size
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_similar_size,
           round(sum(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_size
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 4) AS sum_price_band
    FROM part
    """,
    tags=("window",),
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16 RANGE frame on a numeric ordering key: all parts of the same
    brand within 5 size units below the current part. RANGE frames
    aggregate over *value* peers, so ties need no tie-break column."""
    w = (
        Window.partitionBy("p_brand")
        .orderBy("p_size")
        .rangeBetween(-5, Window.currentRow)
    )
    return t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size",
        F.count("*").over(w).alias("n_similar_size"),
        r4(F.sum("p_retailprice").over(w)).alias("sum_price_band"),
    )


@query(
    "q_win_ntile",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ntile(4) OVER (PARTITION BY o_orderstatus
                          ORDER BY o_totalprice, o_orderkey) AS price_quartile
    FROM orders
    WHERE o_orderkey <= 5000
    """,
    tags=("window",),
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14 companion: ntile bucketing (quartiles of price within order
    status). Deterministic under ties because the ORDER BY ends in the
    unique key — ntile assigns by row position, so tie order must be
    pinned for cross-engine agreement."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderstatus",
        F.ntile(4).over(w).alias("price_quartile"),
    )


def groups_frame(df: DataFrame, partition_by: list[str], order_by: list[str],
                 preceding: int, following: int,
                 aggs: dict[str, "F.Column"]) -> DataFrame:
    """GROUPS window frames — the ANSI frame mode Trino supports and
    Spark lacks (the string front end names the gap) — via the exact
    peer-group equivalence: ``GROUPS BETWEEN n PRECEDING AND m
    FOLLOWING`` aggregates over the rows whose dense_rank (same
    partition/order) lies within [current - n, current + m]. So two
    window passes over ONE exchange+sort: dense_rank assigns the group
    index, then a RANGE frame on that index is definitionally the
    GROUPS frame. ``aggs`` maps output column name -> aggregate Column
    (e.g. ``F.sum("x")``)."""
    grp = F.dense_rank().over(
        Window.partitionBy(*partition_by).orderBy(*order_by))
    w = (Window.partitionBy(*partition_by).orderBy("_grp")
         .rangeBetween(-preceding, following))
    out = df.withColumn("_grp", grp)
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out.drop("_grp")


@query(
    "q_win_frame_groups",
    oracle="""
    WITH g AS (
        SELECT p_partkey, p_brand, p_size, p_retailprice,
               dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size)
                   AS grp
        FROM part
    ), gs AS (
        SELECT p_brand, grp, sum(p_retailprice) AS s, count(*) AS c
        FROM g GROUP BY 1, 2
    )
    SELECT g.p_partkey, g.p_brand, g.p_size,
           CAST(sum(gs.c) AS BIGINT) AS n_band,
           round(sum(gs.s), 4) AS sum_band
    FROM g JOIN gs
      ON gs.p_brand = g.p_brand AND gs.grp BETWEEN g.grp - 2 AND g.grp
    GROUP BY g.p_partkey, g.p_brand, g.p_size
    """,
    tags=("window", "frame"),
)
def q_win_frame_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16 GROUPS frame: per part, count and price mass of the 2
    preceding size-peer GROUPS plus the current group within the brand
    (``GROUPS BETWEEN 2 PRECEDING AND CURRENT ROW``). Spark has no
    GROUPS mode; the groups_frame helper lowers it to dense_rank +
    RANGE — both windows share one exchange+sort, so the plan cost
    equals a native GROUPS frame. The oracle deliberately avoids the
    same trick's window form: it recomputes the frame as a banded join
    on per-group partial aggregates — an independent formulation of the
    same semantics."""
    p = t(spark, sf_dir, "part")
    out = groups_frame(
        p, ["p_brand"], ["p_size"], preceding=2, following=0,
        aggs={"n_band": F.count("*"),
              "sum_band_raw": F.sum("p_retailprice")})
    return out.select(
        "p_partkey", "p_brand", "p_size",
        "n_band", r4(F.col("sum_band_raw")).alias("sum_band"))
