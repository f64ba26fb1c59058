"""The full TPC-H suite in Trino-dialect TEXT — the migration gate.

The reference's deployed query surface is "whatever SQL Trino 400 runs
over the connector's scans" (README.md:74-90), and TPC-H is the
canonical such workload: a migrating reference user's first act is to
paste their existing Trino SQL at the new engine. Prior evidence:
round 8 proved all 22 adapted ORACLE texts (plain ANSI) pass through
``execute_trino`` unchanged and hash-match DuckDB
(tests/test_trino_sql.py::test_full_tpch_suite_runs_as_trino_text);
round 10 proved the genuinely-dialect path for Q1
(``q_trino_tpch_q1``, functions/trino_sql.py). This module closes the
gap between those: every query of the book written the way a TRINO
user writes it — original spec shapes, dialect-specific syntax —
adapted to the reduced fixture schema EXACTLY the way the DataFrame
twins are (operators/analytics.py, analytics_ext.py, tpch_full.py —
no partsupp table, no comment/phone/shipmode columns), so each text
form is row-identical to its twin and reuses the twin's DuckDB oracle
verbatim.

The texts deliberately exercise the Trino-isms a real workload carries,
not lowest-common-denominator ANSI: ``DATE`` literals + quoted
``INTERVAL '3' MONTH`` arithmetic (Q4/Q5/Q6/Q10/Q12/Q14/Q15/Q20),
MySQL-style ``date_format('%Y-%m-%d')`` (Q3/Q18), ``EXTRACT(YEAR
FROM …)`` (Q7/Q8), ``FETCH FIRST n ROWS ONLY`` pagination (Q2/Q10),
correlated ``EXISTS`` (Q4) and the double ``EXISTS``/``NOT EXISTS``
self-reference (Q21 — the ORIGINAL spec shape, not the window
adaptation), a correlated scalar-aggregate subquery (Q17 — original
shape), ``NOT IN (SELECT …)`` (Q16), scalar subqueries over a CTE
(Q11/Q15/Q22), and the comma-join + OR-of-conjuncts predicate (Q19 —
Catalyst's CNF conversion must recover the equi-join key or the plan
degrades to a cartesian product; tests/test_trino_tpch_suite.py
asserts it does not).

Correctness evidence is two-layer:
  - all 21 texts are asserted row-identical to their DataFrame twins at
    sf0.001 by tests/test_trino_tpch_suite.py (the twins are themselves
    hash-green against DuckDB in the driver record), and
  - the eight dialect-hardest texts (Q2, Q4, Q13, Q15, Q17, Q18, Q21,
    Q22) are registered driver keys with the twin's oracle, entering
    the round-11 correctness window per the new-key closure invariant.

Scale notes are the twins': the text path adds ZERO execution cost —
``rewrite_trino_sql`` is pure string work on the driver and the
rewritten query plans through the same Catalyst pipeline (pushdown,
broadcast dims, single fact-shuffle shapes; the Q1 plan-identity test
in tests/test_trino_sql.py established the pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Twin modules must register first so their oracles are reusable here.
from okera_trino_spark.operators import analytics  # noqa: F401
from okera_trino_spark.operators import analytics_ext  # noqa: F401
from okera_trino_spark.operators import tpch_full  # noqa: F401
from okera_trino_spark.functions.trino_sql import (
    TRINO_SQL_TPCH_Q1,
    execute_trino,
)
from okera_trino_spark.registry import QUERIES, query

__all__ = ["TRINO_TPCH", "run_tpch_text"]


def _twin_oracle(key: str) -> str:
    """The DuckDB oracle of the DataFrame twin — reused verbatim so the
    text form and the twin are held to the same hash."""
    oracle = QUERIES[key].oracle
    assert oracle is not None, f"twin {key} has no oracle"
    return oracle


#: Query number -> Trino-dialect SQL text. Semantics match the
#: fixture-adapted DataFrame twins (see module doc); column aliases
#: match the twins' oracles exactly (driver hashes sort by name).
TRINO_TPCH: dict[int, str] = {
    1: TRINO_SQL_TPCH_Q1,
    # Q2 minimum cost supplier: min-per-group via row_number window
    # (Trino has no QUALIFY; the CTE + rn filter is the idiomatic
    # form), FETCH FIRST pagination.
    2: """
    WITH link AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), ranked AS (
        SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
               round(s.s_acctbal, 4) AS acctbal, n.n_name,
               row_number() OVER (PARTITION BY p.p_partkey
                                  ORDER BY s.s_acctbal, s.s_suppkey) AS rn
        FROM part p
        JOIN link k ON k.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = k.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_size = 15 AND p.p_type = 'MEDIUM'
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, acctbal, n_name
    FROM ranked WHERE rn = 1
    ORDER BY acctbal DESC, p_partkey
    FETCH FIRST 20 ROWS ONLY
    """,
    # Q3 shipping priority: MySQL-style date_format (Trino dialect).
    3: """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           date_format(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-06-01'
      AND l.l_shipdate > DATE '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    # Q4 order priority checking: correlated EXISTS + DATE + quoted
    # INTERVAL arithmetic — the original spec shape.
    4: """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-01-01' + INTERVAL '3' MONTH
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    """,
    # Q5 local supplier volume.
    5: """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-01-01' + INTERVAL '2' YEAR
    GROUP BY n.n_name
    """,
    # Q6 forecasting revenue change: pure scan-side predicates.
    6: """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1996-01-01' + INTERVAL '1' YEAR
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    # Q7 volume shipping: EXTRACT(YEAR FROM …) + nation-pair disjunct.
    7: """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= DATE '1995-01-01'
          AND l.l_shipdate < DATE '1997-01-01'
    ) AS shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    # Q8 national market share: the 8-table star with a conditional
    # share ratio.
    8: """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
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
          AND o.o_orderdate >= DATE '1995-01-01'
          AND o.o_orderdate < DATE '1997-01-01'
    ) AS all_nations
    GROUP BY o_year
    """,
    # Q9 product type profit.
    9: """
    SELECT n.n_name, year(o.o_orderdate) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    # Q10 returned item reporting: FETCH FIRST pagination.
    10: """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           round(c.c_acctbal, 4) AS acctbal,
           n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-01-01' + INTERVAL '6' MONTH
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    FETCH FIRST 20 ROWS ONLY
    """,
    # Q11 important stock: scalar subquery over the same CTE.
    11: """
    WITH valued AS (
        SELECT l.l_partkey,
               sum(l.l_extendedprice * l.l_quantity) AS raw_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_7', 'NATION_8')
        GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, round(raw_value, 4) AS value
    FROM valued
    WHERE round(raw_value, 4) >
          round(0.001 * (SELECT sum(raw_value) FROM valued), 4)
    ORDER BY value DESC, p_partkey
    """,
    # Q12 shipping modes: conditional two-count pivot + lateness join
    # residual.
    12: """
    SELECT l.l_linestatus,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate < DATE '1997-01-01' + INTERVAL '1' YEAR
      AND l.l_shipdate > o.o_orderdate
    GROUP BY l.l_linestatus
    """,
    # Q13 customer distribution: LEFT OUTER JOIN with a compound ON
    # predicate + derived-table re-aggregation.
    13: """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
                                AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) AS c_orders
    GROUP BY c_count
    """,
    # Q14 promotion effect: conditional ratio over one month.
    14: """
    SELECT round(100.00 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
           / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1997-09-01'
      AND l.l_shipdate < DATE '1997-09-01' + INTERVAL '1' MONTH
    """,
    # Q15 top supplier: the original's CREATE VIEW revenue0 becomes the
    # idiomatic WITH; global-max scalar subquery over the same CTE.
    15: """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1997-01-01' + INTERVAL '3' MONTH
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(r.total_rev, 4) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    """,
    # Q16 parts/supplier relationship: NOT IN (SELECT …) blacklist.
    16: """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT k.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) k
      ON k.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
      AND k.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    # Q17 small-quantity-order revenue: the ORIGINAL correlated
    # scalar-aggregate subquery (the twin decorrelates it into a join —
    # Catalyst must do the same here or the plan is quadratic).
    17: """
    SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND p.p_size < 10
      AND l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
    # Q18 large volume customer: IN (grouped HAVING subquery) +
    # MySQL-style date_format.
    18: """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           date_format(o.o_orderdate, '%Y-%m-%d') AS order_date,
           round(o.o_totalprice, 4) AS total_price,
           round(sum(l.l_quantity), 4) AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 220
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    """,
    # Q19 discounted revenue: the spec's comma join + OR-of-conjuncts —
    # each disjunct repeats the equi-key, so CNF extraction must
    # recover the hash join (plan-asserted in the suite test).
    19: """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l, part p
    WHERE (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
           AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#2'
           AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
           AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 40)
    """,
    # Q20 potential promotion: IN over a grouped-HAVING subquery chain.
    20: """
    SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 4) AS acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_name LIKE 'small%'
            AND l.l_shipdate >= DATE '1997-01-01'
            AND l.l_shipdate < DATE '1997-01-01' + INTERVAL '1' YEAR
          GROUP BY l.l_suppkey
          HAVING sum(l.l_quantity) > 50
      )
    ORDER BY s.s_name
    """,
    # Q21 suppliers who kept orders waiting: the ORIGINAL double
    # EXISTS / NOT EXISTS self-reference (the twin re-expresses it as
    # windows; "sole strictly-latest shipper among >=2 suppliers" is
    # the same predicate).
    21: """
    WITH per_pair AS (
        SELECT l.l_orderkey, l.l_suppkey, max(l.l_shipdate) AS supp_max
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY l.l_orderkey, l.l_suppkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM per_pair p1
    JOIN supplier s ON s.s_suppkey = p1.l_suppkey
    WHERE EXISTS (
            SELECT 1 FROM per_pair p2
            WHERE p2.l_orderkey = p1.l_orderkey
              AND p2.l_suppkey <> p1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM per_pair p3
            WHERE p3.l_orderkey = p1.l_orderkey
              AND p3.l_suppkey <> p1.l_suppkey
              AND p3.supp_max >= p1.supp_max
          )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    # Q22 global sales opportunity: scalar-average subquery + NOT
    # EXISTS anti-join (original shape; nationkey stands in for the
    # missing phone-prefix cntrycode).
    22: """
    SELECT c.c_nationkey AS cntrycode,
           count(*) AS numcust,
           round(sum(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.00
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
          )
    GROUP BY c.c_nationkey
    """,
}


def run_tpch_text(spark: SparkSession, n: int, sf_dir: str) -> DataFrame:
    """Run TPC-H query ``n`` from its Trino-dialect text."""
    return execute_trino(spark, TRINO_TPCH[n], sf_dir)


# ------------------------------------------------------ registered keys
# The eight dialect-hardest texts enter the driver contract; the other
# thirteen are held to the same hash transitively (text == twin at
# sf0.001 in tests/test_trino_tpch_suite.py; twin == DuckDB in the
# driver record).

#: PLAN-SHAPE NOTE, Q21 (r13, per the r12 verdict's twin-spread watch):
#: the dialect TEXT and the native q_tpch_q21 twin produce row-identical
#: results but DIFFERENT physical plans, and that is intended. The text
#: path lowers the original double EXISTS / NOT EXISTS faithfully —
#: Catalyst decorrelates each into a join, so lineitem is SCANNED THREE
#: TIMES (measured: 3 lineitem FileScans, 2 SortMergeJoins, no Window).
#: The native twin is the at-scale rewrite a pipeline author should use:
#: ONE lineitem scan, one groupBy shuffle, and all predicates as windows
#: over the reused per-order exchange (1 scan + 2 Windows). The bench
#: spread between the twins (~1.2-1.5x at sf0.1, inside session noise
#: per-sample) is therefore an ALGORITHMIC delta — the faithful-text
#: price, not front-end overhead; tests/test_plans.py pins both shapes
#: so a lowering regression (text path gaining/losing scans) or a twin
#: de-optimization is caught. At 100 TB the window form's single fact
#: scan is the difference between one pass and three.
_REGISTERED_DOC = {
    2: "CTE chain + row_number min-per-group + FETCH FIRST pagination",
    4: "correlated EXISTS + DATE literal + quoted INTERVAL arithmetic",
    13: "LEFT OUTER JOIN with compound ON + derived-table re-aggregation",
    15: "WITH view replacement + global-max scalar subquery on the CTE",
    17: "original correlated scalar-aggregate subquery (decorrelation)",
    18: "IN over a grouped-HAVING subquery + MySQL-style date_format",
    21: "original double EXISTS / NOT EXISTS self-reference",
    22: "scalar-average subquery + NOT EXISTS anti-join",
}


def _register(n: int, twin: str) -> None:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_tpch_text(spark, n, sf_dir)

    fn.__name__ = f"q_trino_tpch_q{n}"
    fn.__doc__ = (
        f"TPC-H Q{n} submitted as Trino-dialect TEXT ({_REGISTERED_DOC[n]});"
        f" row-identical to the DataFrame twin {twin} and hashed against"
        " the twin's DuckDB oracle. See module doc for the dialect"
        " surface exercised; reference workload per README.md:74-90."
    )
    query(f"q_trino_tpch_q{n}", oracle=_twin_oracle(twin),
          tags=("trino", "sql", "dialect", "tpch"))(fn)


for _n, _twin in ((2, "q_tpch_q2"), (4, "q_tpch_q4"), (13, "q_tpch_q13"),
                  (15, "q_tpch_q15"), (17, "q_tpch_q17"),
                  (18, "q_tpch_q18"), (21, "q_tpch_q21"),
                  (22, "q_tpch_q22")):
    _register(_n, _twin)
