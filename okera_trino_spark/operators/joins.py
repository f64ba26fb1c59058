"""Join operators — SURVEY.md §2.2 E1–E6.

The reference delegates all joins to the hosting Trino 400 engine
(RecordServiceConnector.java:56-80 exposes no join hooks); here each join
shape is declared via the DataFrame API and Catalyst/AQE picks the
physical strategy. Scale notes per query document the intended 100-TB
plan (broadcast vs sort-merge, where the shuffle lands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 inner equi-join fact→dim.

    Scale: customer is 15M rows at SF100k — below the 64MB broadcast
    threshold after the segment filter prunes 4/5 of it? No: leave the
    choice to Catalyst/AQE. The segment filter is pushed below the join
    so the build side shrinks before strategy selection.
    """
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
    tags=("join",),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 left outer join with an extra ON-clause predicate (NULL-extends
    customers with no qualifying order — exercises ON vs WHERE filter
    placement semantics)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 400000)
    return cust.join(orders, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_right",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name
    FROM orders o RIGHT JOIN customer c
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
    tags=("join",),
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 right outer join — the mirror of q_join_left with the orders
    side NULL-extended instead: every customer survives; order columns
    are NULL where no order clears the ON-clause price predicate.

    Scale: identical shuffle profile to the left join (Catalyst plans
    right-outer as the flipped left-outer); the ON-clause predicate
    prunes the streamed side before the join."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 400000)
    return orders.join(cust, cond, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@query(
    "q_join_full",
    oracle="""
    SELECT cn.nationkey AS c_nation, cn.n_cust, sn.nationkey AS s_nation, sn.n_supp
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
          FROM customer GROUP BY c_nationkey) cn
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, count(*) AS n_supp
          FROM supplier GROUP BY s_nationkey) sn
      ON cn.nationkey = sn.nationkey
    """,
    tags=("join",),
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 full outer join of two pre-aggregated sides (suppliers cover
    fewer nations than customers → NULL extension on both sides).

    Scale: pre-aggregating before the join shrinks both shuffle inputs
    to |nations| rows — aggregate-below-join is the scalable shape.
    """
    cn = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cn.join(sn, cn.nationkey == sn.nationkey, "full").select(
        cn.nationkey.alias("c_nation"), "n_cust",
        sn.nationkey.alias("s_nation"), "n_supp",
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 left-semi join (EXISTS). Semi joins never duplicate the probe
    side, so the shuffle carries each customer once regardless of order
    count — preferred over join+distinct at scale."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 left-anti join (NOT EXISTS): customers with no orders."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    tags=("join",),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 cross join — only ever sane when one side is tiny; Catalyst
    broadcasts the smaller side (BroadcastNestedLoopJoin)."""
    return t(spark, sf_dir, "region").crossJoin(t(spark, sf_dir, "nation")).select(
        "r_name", "n_name"
    )


@query(
    "q_join_theta",
    oracle="""
    SELECT s.s_suppkey, count(*) AS n_richer
    FROM supplier s JOIN customer c ON c.c_acctbal > s.s_acctbal
    GROUP BY s.s_suppkey
    """,
    tags=("join",),
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 theta (non-equi) join: per supplier, customers with larger
    balance. Physical plan is BroadcastNestedLoopJoin with the tiny
    supplier side broadcast — the only scalable NL shape. (A band/range
    join at scale would bucketize the predicate; see llm/similarity for
    that pattern.)"""
    supp = t(spark, sf_dir, "supplier")
    cust = t(spark, sf_dir, "customer")
    return (
        supp.join(cust, cust.c_acctbal > supp.s_acctbal, "inner")
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_richer"))
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT r.r_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("join", "agg"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 explicit broadcast of the dim chain (TPC-H Q5 shape).

    supplier→nation→region is a few KB–MB at any SF; broadcasting all
    three means the 100-TB lineitem scan never shuffles before the
    final 5-group aggregate — the canonical star-schema plan.
    """
    li = t(spark, sf_dir, "lineitem")
    supp = F.broadcast(t(spark, sf_dir, "supplier"))
    nat = F.broadcast(t(spark, sf_dir, "nation"))
    reg = F.broadcast(t(spark, sf_dir, "region"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@query(
    "q_join_range_banded",
    oracle="""
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS dt_sec
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
    tags=("join", "range", "custom"),
)
def q_join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 at scale: range join (event pairs of the same user within 30
    minutes) executed by BANDING — the SCALE.md range-join strategy,
    here verified equal to the naive range join (the oracle).

    Band = floor(epoch/1800s). Every qualifying pair lands either in
    the same band or adjacent bands, so probing band and band+1 with a
    plain EQUI-join on (user_id, band) finds all candidates; the exact
    range predicate then filters. One hash shuffle instead of the
    nested-loop pair scan a non-equi condition forces — the row
    multiplication is bounded by band occupancy (watermark-style time
    locality), not table size.
    """
    e = t(spark, sf_dir, "events")
    band = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 1800)
    a = e.select(F.col("event_id").alias("event_a"), "user_id",
                 F.col("ts").alias("ts_a"), band.alias("band_a"))
    # Probe both own and next band: b's band is either band_a or band_a+1
    # for any b within (ts_a, ts_a + 30min].
    probes = a.withColumn("probe", F.explode(F.array(F.col("band_a"), F.col("band_a") + 1)))
    b = e.select(F.col("event_id").alias("event_b"), F.col("user_id").alias("user_b"),
                 F.col("ts").alias("ts_b"), band.alias("band_b"))
    return (
        probes.join(b, (F.col("user_id") == F.col("user_b"))
                    & (F.col("probe") == F.col("band_b")))
        .filter((F.col("ts_b") > F.col("ts_a"))
                & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 30 MINUTE")))
        .select("event_a", "event_b",
                # DuckDB date_diff('second') counts second-boundary
                # crossings; truncated-epoch subtraction matches that
                # (timestampdiff floors the true delta — off by one on
                # sub-second timestamps).
                (F.unix_timestamp(F.col("ts_b").cast("timestamp"))
                 - F.unix_timestamp(F.col("ts_a").cast("timestamp")))
                .cast("bigint").alias("dt_sec"))
    )
