"""Extended composite analytics — the rest of the TPC-H-shaped workload.

Round 1 covered Q1/Q3/Q4/Q5/Q10/Q18 (operators/analytics.py). This
module widens the composite surface to the remaining TPC-H query shapes
expressible over the reduced fixture schema (FIXTURES.md: no partsupp,
no shipmode/commitdate/receiptdate/container columns), because the
reference's deployed surface is "whatever SQL Trino runs over the
connector" (README.md:74-90) — breadth of whole-query shapes is the
parity target, not just isolated operators.

Each query keeps the scale discipline of analytics.py:
- dims (part/supplier/customer/nation/region) broadcast explicitly;
  the only shuffle joins are fact⋈fact (orders⋈lineitem);
- every filter sits on the scan so pushdown/pruning reach parquet;
- single-row global aggregates still produce deterministic output;
- computed columns aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ------------------------------------------------------ Q6 forecast revenue
@query(
    "q_tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("composite", "scan", "agg"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan+filter+global agg.

    The whole WHERE clause is scan-local — all three predicates reach the
    parquet reader (PushedFilters + row-group min/max pruning on
    l_shipdate), so at 100 TB this reads only the matching year's row
    groups and three columns. No shuffle at all until the single-row
    final agg merge.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))


# ---------------------------------------------------- Q7 volume shipping
_N1, _N2 = "NATION_1", "NATION_2"


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = '{_N1}' AND n2.n_name = '{_N2}')
            OR (n1.n_name = '{_N2}' AND n2.n_name = '{_N1}'))
          AND l.l_shipdate >= TIMESTAMP '1995-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("composite", "join", "agg"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by year. Exercises a disjunctive join-level predicate over
    two broadcast nation dims plus the orders⋈lineitem shuffle join.

    Plan shape: supplier/customer/nation all broadcast; the nation-pair
    disjunction is evaluated post-join on broadcast columns (cheap), and
    the date filter is pushed to the lineitem scan.
    """
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz")))
    pair = (
        ((F.col("supp_nation") == _N1) & (F.col("cust_nation") == _N2))
        | ((F.col("supp_nation") == _N2) & (F.col("cust_nation") == _N1))
    )
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(r4(F.sum(_rev())).alias("revenue"))
    )


# ------------------------------------------------- Q8 national market share
@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           round(sum(CASE WHEN nation = '{_N1}' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
    )
    GROUP BY o_year
    """,
    tags=("composite", "join", "agg"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): share of one supplier-nation in
    an importing region's consumption of one part type, by order year —
    an 8-table star with a conditional-aggregate ratio.

    Plan shape: every dim broadcasts; orders⋈lineitem is the lone
    shuffle; the part-type and region filters prune their broadcast
    sides before the join, so the fact rows that survive are a small
    slice of the table at any scale.
    """
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")))
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    li = t(spark, sf_dir, "lineitem")
    vol = _rev()
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(r4(
            F.sum(F.when(F.col("nation") == _N1, vol).otherwise(F.lit(0.0)))
            / F.sum(vol)
        ).alias("mkt_share"))
    )


# -------------------------------------------- Q13 customer order distribution
@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("composite", "join", "agg"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): how many customers placed
    k orders, including k=0 — the outer-join-then-double-aggregate shape
    (a LEFT join whose unmatched rows carry the zero bucket, so a plain
    inner join would silently drop them).

    Plan shape: count-per-customer shuffles on c_custkey; the second agg
    shuffles |distinct counts| rows — negligible. The join-level filter
    on priority is applied to the orders scan (pushed) because it sits
    in the ON clause of the outer join's preserved side.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------- Q14 promotion effect
@query(
    "q_tpch_q14",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                             THEN l.l_extendedprice * (1 - l.l_discount)
                             ELSE 0 END)
           / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("composite", "join", "agg"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percent of one month's revenue from
    PROMO parts — a broadcast dim join + conditional-aggregate ratio.

    Plan shape: one-month shipdate filter is pushed to the fact scan
    (row-group pruning makes this a ~1/84th scan of the table); part
    broadcasts; single-row result, no shuffle beyond the final merge.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz")))
    p = t(spark, sf_dir, "part")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0)))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(r4(F.lit(100.0) * promo / F.sum(_rev())).alias("promo_revenue"))
    )


# ------------------------------------------------------- Q15 top supplier
@query(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(r.total_rev, 4) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    """,
    tags=("composite", "subquery", "agg"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximum quarterly
    revenue — a derived aggregate reused twice (once for the max, once
    for the rows), the classic view + scalar-subquery shape.

    Plan shape: one shuffle to aggregate revenue per supplier
    (|suppliers| rows); the max-filter is a GLOBAL WINDOW over that
    already-aggregated frame — |suppliers| rows through one partition,
    trivially small — so the fact table is scanned and aggregated
    exactly once. (The naive two-branch form — aggregate once for the
    max, again for the rows — does NOT get ReuseExchange'd by Catalyst
    because the subtrees differ, and scans lineitem twice; verified via
    explain, hence this single-pipeline shape.)
    """
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz")))
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_rev"))
    )
    max_rev = F.max("total_rev").over(Window.partitionBy())
    s = t(spark, sf_dir, "supplier")
    return (
        revenue.withColumn("max_rev", max_rev)
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", r4(F.col("total_rev")).alias("total_revenue"))
    )


# ------------------------------------------- Q17 small-quantity-order revenue
@query(
    "q_tpch_q17",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
        FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND p.p_size < 10
      AND l.l_quantity < a.half_avg_qty
    """,
    tags=("composite", "subquery", "agg"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from orders of a
    brand's small parts at quantities below half the part's average — the
    correlated-scalar-subquery shape, decorrelated into a per-part
    aggregate join (exactly what Catalyst's RewriteCorrelatedScalarQuery
    produces, stated explicitly here so the plan is the point).

    Plan shape: the per-part average is one shuffle on l_partkey; the
    re-join to lineitem co-partitions on the same key (no extra
    exchange); part is a filtered broadcast. At 100 TB the brand+size
    filter would also be semi-joined into the avg subquery to skip
    aggregating parts that can't qualify — Spark's AQE does not do this
    automatically, so the avg is computed over all parts (documented
    trade-off; the aggregate output is |parts| rows, still small).
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 10))
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg((F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty"))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(r4(F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# --------------------------------------------------- Q19 disjunctive revenue
@query(
    "q_tpch_q19",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("composite", "join", "filter"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): three OR'd brand/size/quantity
    predicate branches spanning both join sides — the disjunctive
    pushdown stress test.

    Plan shape: Catalyst cannot push the cross-side OR below the join,
    but it DOES derive the single-side implications (p_brand IN (...) on
    the part scan, l_quantity BETWEEN 1 AND 40 on the lineitem scan) via
    constraint propagation, so both scans still prune. Part broadcasts;
    the residual OR evaluates post-join on in-memory columns.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(branch)
        .agg(r4(F.sum(_rev())).alias("revenue"))
    )


# ------------------------------------------------------ events funnel
@query(
    "q_events_funnel",
    oracle="""
    WITH fv AS (
        SELECT user_id, min(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
        SELECT f.user_id, min(e.ts) AS first_purchase
        FROM fv f
        JOIN events e ON e.user_id = f.user_id
                     AND e.event_type = 'purchase'
                     AND e.ts > f.first_view
        GROUP BY f.user_id
    )
    SELECT f.user_id,
           strftime(f.first_view, '%Y-%m-%d %H:%M:%S') AS first_view,
           strftime(p.first_purchase, '%Y-%m-%d %H:%M:%S') AS first_purchase,
           CASE WHEN p.first_purchase IS NULL THEN 0
                WHEN p.first_purchase <= f.first_view + INTERVAL 1 HOUR
                THEN 1 ELSE 0 END AS converted_1h
    FROM fv f LEFT JOIN fp p ON f.user_id = p.user_id
    """,
    tags=("composite", "events", "funnel"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel over the event stream: per user, first 'view'
    then the first 'purchase' strictly after it, flagging 1-hour
    conversion — the behavioral-analytics shape (funnel/retention)
    engines bolt onto event tables.

    Plan: two aggregates on user_id plus a self-join, all sharing the
    user_id shuffle key — Catalyst co-partitions the pipeline after the
    first exchange, so the funnel costs one effective shuffle of the
    events table however many funnel stages are chained. The 1-hour gate is
    plain timestamp+interval comparison — exact microsecond arithmetic
    in both engines (DuckDB date_diff counts boundary crossings and is
    avoided; unix_micros rejects TIMESTAMP_NTZ).
    """
    ev = t(spark, sf_dir, "events")
    fv = (ev.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("first_view")))
    fp = (
        fv.join(ev, (ev.user_id == fv.user_id)
                & (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("first_view")))
        .groupBy(fv.user_id.alias("u2"))
        .agg(F.min("ts").alias("first_purchase"))
    )
    joined = fv.join(fp, fv.user_id == fp.u2, "left")
    converted = F.when(F.col("first_purchase").isNull(), 0).when(
        F.col("first_purchase") <= F.col("first_view") + F.expr("INTERVAL 1 HOUR"),
        1).otherwise(0)
    return joined.select(
        "user_id",
        F.date_format("first_view", "yyyy-MM-dd HH:mm:ss").alias("first_view"),
        F.date_format("first_purchase", "yyyy-MM-dd HH:mm:ss").alias("first_purchase"),
        converted.alias("converted_1h"),
    )


# --------------------------------------------- Q22 global sales opportunity
@query(
    "q_tpch_q22",
    oracle="""
    SELECT c.c_nationkey AS cntrycode,
           count(*) AS numcust,
           round(sum(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
    tags=("composite", "subquery", "antijoin"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: well-funded
    customers (balance above the positive-balance average) with no
    urgent orders, grouped by nation — the scalar-subquery +
    NOT-EXISTS-anti-join composite.

    Plan shape: the scalar average is a single-row aggregate broadcast
    into the filter; the NOT EXISTS is a left-anti hash join against the
    filtered orders scan (priority filter pushed). The anti join
    shuffles on custkey only for rows already past the balance filter —
    predicate order matters and Catalyst keeps the cheap filter first.
    """
    c = t(spark, sf_dir, "customer")
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("avg_bal")))
    urgent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(F.count("*").alias("numcust"),
             r4(F.sum("c_acctbal")).alias("totacctbal"))
    )


# ------------------------------------------ hypertable rollup with gap-fill
_GF_START, _GF_END = "2024-01-01 00:00:00", "2024-01-30 23:00:00"


@query(
    "q_events_gapfill",
    oracle=f"""
    WITH spine AS (
        SELECT u.user_id, g.bucket
        FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20) u
        CROSS JOIN (SELECT unnest(generate_series(
            TIMESTAMP '{_GF_START}', TIMESTAMP '{_GF_END}',
            INTERVAL 1 HOUR)) AS bucket) g
    ),
    hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               count(*) AS n_events, sum(value) AS sum_value
        FROM events WHERE user_id < 20
        GROUP BY 1, 2
    )
    SELECT s.user_id,
           strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           coalesce(h.n_events, 0) AS n_events,
           round(coalesce(h.sum_value, 0.0), 4) AS sum_value,
           round(coalesce(
               last_value(h.sum_value IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               0.0), 4) AS sum_value_locf
    FROM spine s LEFT JOIN hourly h
      ON s.user_id = h.user_id AND s.bucket = h.bucket
    """,
    tags=("composite", "events", "timeseries", "custom"),
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup with gap-fill: hourly per-user buckets over a
    fixed spine INCLUDING empty hours (zero-filled counts) plus a
    carried-forward last-observation value — the time-series resample /
    LOCF operator (feature-store backfills, monitoring rollups) that
    neither Trino nor Spark ships natively.

    Composition: the dense spine is generated (sequence + explode — no
    scan, |users|×|hours| rows created executor-side), the rollup is one
    groupBy on (user, hour), and both sides join on user_id+bucket; the
    LOCF is a running window per user. Two shuffles total (rollup, then
    spine join/window share the user partitioning) at any scale; the
    spine never exceeds users × horizon regardless of event volume.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    users = ev.select("user_id").distinct()
    spine = users.select(
        "user_id",
        F.explode(F.sequence(
            F.lit(_GF_START).cast("timestamp_ntz"),
            F.lit(_GF_END).cast("timestamp_ntz"),
            F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
    )
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )
    joined = spine.join(hourly, ["user_id", "bucket"], "left")
    locf = F.last("sum_value", ignorenulls=True).over(
        Window.partitionBy("user_id").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        r4(F.coalesce("sum_value", F.lit(0.0))).alias("sum_value"),
        r4(F.coalesce(locf, F.lit(0.0))).alias("sum_value_locf"),
    )


# ------------------------------------------------------- retention cohorts
@query(
    "q_events_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_w
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_w
        FROM events
    )
    SELECT strftime(f.cohort_w, '%Y-%m-%d') AS cohort_week,
           strftime(a.active_w, '%Y-%m-%d') AS active_week,
           count(*) AS n_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    tags=("composite", "events", "retention"),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-seen week
    (cohort), counted in every week they were active — the
    cohort-retention triangle behind activation dashboards.

    Plan shape (r16, guide §2.3/§2.4): ONE scan of events builds the
    distinct (user, week) activity relation with the user's earliest
    event IN that week as a combinable min — the former plan scanned
    events twice (cohort aggregate + activity distinct) and joined the
    two back on user_id. The cohort week is then a running min over
    the per-user activity rows (a window on the tiny distinct relation,
    bounded by |users|x|weeks| regardless of event volume), and
    min-over-weeks-of-per-week-mins == min(ts) per user exactly
    (timestamp min is order-insensitive; no floats involved). Shuffles:
    the (user, week) aggregate (map-side combined), the |activity|-row
    window exchange, the |weeks|²-group final — the event-volume-sized
    exchange count drops from two (agg + distinct) to one.
    """
    ev = t(spark, sf_dir, "events")
    wk = (ev.groupBy("user_id", F.date_trunc("week", "ts").alias("active_w"))
          .agg(F.min("ts").alias("_min_ts")))
    cohort_w = F.date_trunc(
        "week",
        F.min("_min_ts").over(Window.partitionBy("user_id")))
    return (
        wk.select("user_id", "active_w", cohort_w.alias("cohort_w"))
        .groupBy(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            F.date_format("active_w", "yyyy-MM-dd").alias("active_week"))
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------- table profiling
@query(
    "q_profile_orders",
    oracle="""
    SELECT 'o_custkey' AS col, count(*) AS n_rows,
           count(o_custkey) AS n_nonnull,
           count(DISTINCT o_custkey) AS n_distinct,
           CAST(round(min(o_custkey), 4) AS VARCHAR) AS min_v,
           CAST(round(max(o_custkey), 4) AS VARCHAR) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(round(min(o_totalprice), 4) AS VARCHAR),
           CAST(round(max(o_totalprice), 4) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(o_orderstatus),
           count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
    FROM orders
    """,
    tags=("composite", "profile", "stats"),
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator: per-column row/non-null/distinct counts
    plus min/max — the ANALYZE-style profile a catalog publishes for CBO
    and data-quality monitoring (C13's per-column extension).

    Plan shape: ONE aggregate computes every column's stats in a single
    pass (count/countDistinct/min/max per column in one agg node —
    Spark expands the multi-distinct into one Expand + aggregate), then
    a scan-free unpivot to rows. The oracle's UNION ALL reads the table
    once per column; the single-pass form is the 100-TB shape.
    """
    o = t(spark, sf_dir, "orders")
    wide = o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("nn_custkey"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        F.min("o_custkey").alias("min_custkey"),
        F.max("o_custkey").alias("max_custkey"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderstatus").alias("min_status"),
        F.max("o_orderstatus").alias("max_status"),
    )
    def num(c):
        # Canonical numeric rendering matching DuckDB round(x,4)::VARCHAR,
        # which always yields a DOUBLE ("149.0" even for integer inputs).
        return F.expr(f"CAST(round(CAST({c} AS DOUBLE), 4) AS STRING)")
    rows = [
        F.struct(F.lit("o_custkey").alias("col"), F.col("n_rows"),
                 F.col("nn_custkey").alias("n_nonnull"),
                 F.col("nd_custkey").alias("n_distinct"),
                 num("min_custkey").alias("min_v"), num("max_custkey").alias("max_v")),
        F.struct(F.lit("o_totalprice").alias("col"), F.col("n_rows"),
                 F.col("nn_price").alias("n_nonnull"),
                 F.col("nd_price").alias("n_distinct"),
                 num("min_price").alias("min_v"), num("max_price").alias("max_v")),
        F.struct(F.lit("o_orderstatus").alias("col"), F.col("n_rows"),
                 F.col("nn_status").alias("n_nonnull"),
                 F.col("nd_status").alias("n_distinct"),
                 F.col("min_status").alias("min_v"), F.col("max_status").alias("max_v")),
    ]
    return (
        wide.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.col", "s.n_rows", "s.n_nonnull", "s.n_distinct",
                "s.min_v", "s.max_v")
    )


# ----------------------------------------------- per-group outlier detection
@query(
    "q_events_outliers",
    oracle="""
    WITH st AS (
        SELECT event_type, avg(value) AS m, stddev_samp(value) AS s
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, round(e.value, 4) AS value_r4,
           round((e.value - st.m) / st.s, 4) AS z
    FROM events e JOIN st USING (event_type)
    WHERE abs(round((e.value - st.m) / st.s, 4)) > 3
    """,
    tags=("events", "analytics", "outliers"),
)
def q_events_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection over the events stream: events
    whose value deviates > 3 sigma from their event-type's mean — the
    data-quality screen that precedes metric aggregation.

    Scale shape: per-type moments via one map-side-combined groupBy
    (|event_types| rows out), BROADCAST back onto the fact scan, filter
    inline — deliberately NOT a Window.partitionBy(event_type), whose
    per-type partitions grow unboundedly with data volume (the
    agg+broadcast form never materializes a type's events in one task).
    The outlier predicate compares the ROUNDED z-score in both engines
    so float last-bit order can't flip a boundary event.
    """
    e = t(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("s"))
    z = F.round((F.col("value") - F.col("m")) / F.col("s"), 4)
    return (
        e.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 3)
        .select("event_id", "event_type",
                F.round("value", 4).alias("value_r4"), "z")
    )


@query(
    "q_events_sessionize",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM marked
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS duration_us
    FROM sess
    GROUP BY user_id, session_seq
    """,
    tags=("composite", "events", "session"),
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH sessionization — the gap-based session assignment every
    clickstream pipeline runs (the batch twin of the streaming session
    window S3): a new session starts when a user's inter-event gap
    exceeds 30 minutes; a running sum of the session-start markers
    numbers each user's sessions; per-session rollup reports size,
    start, duration.

    Gap and duration are computed in MICROSECONDS on both engines:
    second-granularity arithmetic would truncate on the Spark side but
    boundary-count on the DuckDB side — exact integer microseconds is
    the one representation both agree on at the fixture's timestamp
    resolution.

    Scale: both windows partition by user_id (bounded per-user event
    counts — no unbounded partition) and share one exchange+sort (same
    partitioning and ordering); the rollup shuffles on
    (user_id, session_seq). Deterministic tie-break via event_id for
    equal timestamps.
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.col("_us") - F.lag("_us").over(w)
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        e.select("user_id", "ts", "event_id", epoch_us.alias("_us"))
        .withColumn("new_session", new_session)
        .withColumn("session_seq", F.sum("new_session").over(run))
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(F.count("*").alias("n_events"),
             F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
             (F.max("_us") - F.min("_us")).alias("duration_us"))
    )
