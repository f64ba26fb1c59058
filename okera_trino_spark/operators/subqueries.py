"""Subqueries, CTEs, VALUES — SURVEY.md §2.2 E23–E24, E35.

Engine-delegated in the reference (Trino decorrelates subqueries; so
does Catalyst). Implemented via spark.sql over registered fixture views
where SQL is the natural declaration — Catalyst rewrites correlated
predicates into joins, so none of these plans execute per-row
subqueries at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import t
from okera_trino_spark.registry import query
from okera_trino_spark.sources.catalog import register_tables


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
    """,
    tags=("subquery",),
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23 uncorrelated scalar subquery — planned as a broadcast of the
    single aggregated value into the scan filter."""
    register_tables(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@query(
    "q_subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      AND o_orderstatus = 'O'
    """,
    tags=("subquery",),
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23 IN-subquery → Catalyst rewrites to left-semi join."""
    register_tables(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
          AND o_orderstatus = 'O'
        """
    )


@query(
    "q_subquery_corr",
    oracle="""
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) * 1.5
                         FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    """,
    tags=("subquery",),
)
def q_subquery_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23 correlated scalar subquery — decorrelated into an aggregate
    on the correlation key joined back (no per-row execution)."""
    register_tables(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) * 1.5
                             FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "q_cte",
    oracle="""
    WITH nation_spend AS (
        SELECT c.c_nationkey, round(sum(o.o_totalprice), 4) AS spend
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    )
    SELECT n.n_name, ns.spend
    FROM nation_spend ns JOIN nation n ON ns.c_nationkey = n.n_nationkey
    WHERE ns.spend > 0
    """,
    tags=("subquery",),
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E24 WITH/CTE — a named subplan reused by the outer query."""
    register_tables(spark, sf_dir, ["orders", "customer", "nation"])
    return spark.sql(
        """
        WITH nation_spend AS (
            SELECT c.c_nationkey, round(sum(o.o_totalprice), 4) AS spend
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_nationkey
        )
        SELECT n.n_name, ns.spend
        FROM nation_spend ns JOIN nation n ON ns.c_nationkey = n.n_nationkey
        WHERE ns.spend > 0
        """
    )


@query(
    "q_values",
    oracle="""
    SELECT t.pri AS priority_code, o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3)) AS t(name, pri)
      ON o.o_orderpriority = t.name
    GROUP BY t.pri, o.o_orderpriority
    """,
    tags=("subquery",),
)
def q_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E35 VALUES inline table joined against a fixture table (the
    inline side is a LocalRelation — broadcast for free)."""
    register_tables(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT t.pri AS priority_code, o.o_orderpriority, count(*) AS n_orders
        FROM orders o
        JOIN VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3) AS t(name, pri)
          ON o.o_orderpriority = t.name
        GROUP BY t.pri, o.o_orderpriority
        """
    )


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE days(d) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT d + 1 FROM days WHERE d < DATE '1995-02-28'
    )
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(o.o_totalprice), 0) AS DOUBLE) AS total
    FROM days LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = days.d
    GROUP BY days.d
    ORDER BY days.d
    """,
    tags=("subquery", "recursive"),
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Trino supports recursive WITH; Spark gained it in
    4.0) — the calendar-spine pattern: generate every day of a window
    recursively, LEFT JOIN facts onto the spine so empty days appear as
    zero rows (the shape gap-filling reports use when no row exists to
    anchor a sequence() call).

    Scale: the recursion materializes one 59-row spine on the driver
    side of the plan (each step is a 1-row union — depth bounded by the
    window, not the data); the spine then BROADCASTS into the left join
    against the fact scan, so the 100-TB side is scanned once with no
    shuffle. Day strings are emitted identically by both engines
    (date_format vs strftime) so the hash compares exactly."""
    register_tables(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH RECURSIVE days(d) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT date_add(d, 1) FROM days WHERE d < DATE '1995-02-28'
        )
        SELECT date_format(days.d, 'yyyy-MM-dd') AS day,
               count(o.o_orderkey) AS n_orders,
               CAST(coalesce(sum(o.o_totalprice), 0) AS DOUBLE) AS total
        FROM days LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = days.d
        GROUP BY days.d
        ORDER BY days.d
        """
    )
