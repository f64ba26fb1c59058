"""Aggregation operators — SURVEY.md §2.2 E7–E13, E34.

All engine-delegated in the reference (Trino 400 hash aggregation);
declared here via groupBy/agg so Spark plans partial (map-side) + final
aggregation around a keys-only shuffle. Doubles are rounded identically
in Spark and oracle (see operators/_util.r4) because parallel FP
summation is order-dependent in the last bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query


@query(
    "q_agg_group",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS sum_price,
           round(avg(o_totalprice), 4) AS avg_price,
           round(min(o_totalprice), 4) AS min_price,
           round(max(o_totalprice), 4) AS max_price
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    tags=("agg",),
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 grouped hash aggregate, multi-function."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("sum_price"),
            r4(F.avg("o_totalprice")).alias("avg_price"),
            r4(F.min("o_totalprice")).alias("min_price"),
            r4(F.max("o_totalprice")).alias("max_price"),
        )
    )


@query(
    "q_agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           min(l_orderkey) AS min_key,
           max(l_orderkey) AS max_key
    FROM lineitem
    """,
    tags=("agg",),
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 global (no GROUP BY) aggregate: partial per partition, single
    final reducer — constant shuffle volume at any scale."""
    return t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9 DISTINCT aggregate. Spark expands this to a two-phase plan
    (dedup on (status, custkey) then count) — the shuffle carries
    distinct pairs, not raw rows."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query("q_agg_approx_distinct", oracle=None, tags=("agg", "approx"))
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10 approx_distinct (HLL++). Sketch values are engine-specific
    (Trino/Spark/DuckDB HLLs all differ) → rows-only driver check; the
    unit test bounds |approx − exact| ≤ 3·rsd·exact instead
    (tests/test_bounds.py)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers"))
    )


#: Deterministic-HLL parameters: m = 2^9 buckets from the top 9 bits of
#: a 52-bit md5-prefix hash (the double-safe hash family the MinHash
#: oracle established); the remaining 43 bits feed the leading-zero
#: rank. alpha is the standard HLL bias constant for m = 512.
_HLL_M = 512
_HLL_REST = 43
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)


def _hll_oracle() -> str:
    am2 = f"CAST({_HLL_ALPHA * _HLL_M * _HLL_M!r} AS DOUBLE)"
    return f"""
    WITH h AS (
        SELECT o_orderstatus,
               ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 13))
                   ::BIGINT AS hv
        FROM orders WHERE o_custkey IS NOT NULL
    ), parts AS (
        SELECT o_orderstatus, hv // {2 ** _HLL_REST} AS bucket,
               hv % {2 ** _HLL_REST} AS w
        FROM h
    ), rho AS (
        SELECT o_orderstatus, bucket,
               max(CASE WHEN w = 0 THEN {_HLL_REST + 1}
                        ELSE {_HLL_REST + 1} - length(bin(w)) END) AS mj
        FROM parts GROUP BY o_orderstatus, bucket
    ), agg AS (
        SELECT o_orderstatus,
               sum(power(CAST(2.0 AS DOUBLE), -mj))
                   + ({_HLL_M} - count(*)) AS s,
               {_HLL_M} - count(*) AS v
        FROM rho GROUP BY o_orderstatus
    )
    SELECT o_orderstatus,
           CAST(round(CASE WHEN {am2} / s <= 2.5 * {_HLL_M} AND v > 0
                      THEN {_HLL_M} * ln({_HLL_M} / CAST(v AS DOUBLE))
                      ELSE {am2} / s END) AS BIGINT) AS approx_customers
    FROM agg
    """


@query("q_agg_approx_distinct_det", oracle=_hll_oracle(),
       tags=("agg", "approx"))
def q_agg_approx_distinct_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10 approx distinct with a DETERMINISTIC HyperLogLog built from
    first principles (r8) — the hash-green twin of
    q_agg_approx_distinct: native engine sketches (Trino/Spark/DuckDB
    HLL++) all produce different values by construction, so this key
    defines the sketch itself in engine-neutral arithmetic and the
    oracle replays it exactly.

    Construction: 52-bit md5-prefix hash (the double-safe family the
    MinHash oracle established) → top 9 bits pick one of m=512
    buckets, the rank is the leading-zero count of the remaining 43
    bits computed EXACTLY as 44 − length(binary digits) — string
    length, not floating log2, so the per-bucket maxima are integers
    both engines agree on bit-for-bit. The estimator is standard HLL
    (alpha·m²/Σ2^−Mj with linear counting below 2.5m); 2^−Mj terms
    are exact powers of two, so the only cross-engine float noise is
    last-ulp summation order, absorbed by the final round().

    Scale: identical shape to any grouped agg — map-side combinable
    max per (group, bucket), then m rows per group; the sketch state
    is m integers regardless of input size, the property that makes
    HLL THE count-distinct at 100 TB. Accuracy ~1.04/√m ≈ 4.6%
    (tests/test_bounds.py pins it against exact counts).
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    hv = F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 13),
                16, 10).cast("long")
    w = F.col("hv") % F.lit(2 ** _HLL_REST)
    bits = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(_HLL_REST + 1)).otherwise(
        F.lit(_HLL_REST + 1) - bits)
    per_bucket = (
        o.select("o_orderstatus", hv.alias("hv"))
        .select("o_orderstatus",
                F.expr(f"hv div {2 ** _HLL_REST}").alias("bucket"),
                rho.alias("rho"))
        .groupBy("o_orderstatus", "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    am2 = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
    agg = per_bucket.groupBy("o_orderstatus").agg(
        (F.sum(F.pow(F.lit(2.0), -F.col("mj")))
         + (F.lit(_HLL_M) - F.count("*"))).alias("s"),
        (F.lit(_HLL_M) - F.count("*")).alias("v"))
    raw = am2 / F.col("s")
    lin = F.lit(_HLL_M) * F.log(F.lit(_HLL_M) / F.col("v").cast("double"))
    est = F.when((raw <= 2.5 * _HLL_M) & (F.col("v") > 0), lin).otherwise(raw)
    return agg.select(
        "o_orderstatus", F.round(est).cast("bigint").alias("approx_customers"))


@query(
    "q_agg_approx_percentile_det",
    oracle="""
    WITH s AS (
        SELECT o_orderstatus, o_totalprice
        FROM orders
        WHERE ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)
                                     || ':pctl'), 1, 13))::BIGINT
              % 100 < 10
    )
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           count(*) AS n_sampled
    FROM s GROUP BY o_orderstatus
    """,
    tags=("agg", "approx"),
)
def q_agg_approx_percentile_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13 approx percentile with a DETERMINISTIC sample sketch (r8) —
    the hash-green twin of q_agg_approx_percentile: native quantile
    sketches (GK/t-digest/KLL) are engine-specific, so this key makes
    the approximation itself deterministic — a 10% md5-keep-gate
    Bernoulli sample (the q_sample/q_llm_mix technique: the keep
    decision is a pure function of the row key, identical in every
    engine and under AQE/re-runs) followed by the EXACT interpolated
    percentile over the sample. Both engines use the same (n−1)·p
    linear interpolation, so the values replay bit-for-bit and round(4)
    hash-checks.

    Scale: the gate is a map-only filter the scan absorbs; the exact
    percentile then runs over ~10% of rows — at 100 TB one would lower
    the rate (the estimator error is O(1/sqrt(np)), so a 10^-4 gate on
    10^12 rows still samples 10^8). The sample is also REUSABLE across
    quantiles and queries because it is a deterministic row property,
    unlike a sketch merge. tests/test_bounds.py pins the rank error
    against exact percentiles.
    """
    o = t(spark, sf_dir, "orders")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.col("o_orderkey").cast("string"),
                           F.lit(":pctl"))), 1, 13),
        16, 10).cast("long")
    samp = o.withColumn("hv", hv).filter(F.col("hv") % 100 < 10)
    return (
        samp.groupBy("o_orderstatus")
        .agg(F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
             F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
             F.count("*").alias("n_sampled"))
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11 ROLLUP: (status, priority), (status), () grouping sets."""
    return (
        t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), r4(F.sum("o_totalprice")).alias("sum_price"))
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11 CUBE: all 4 grouping sets over two keys."""
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), r4(F.sum("l_quantity")).alias("sum_qty"))
    )


@query(
    "q_agg_gsets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg",),
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11 explicit GROUPING SETS (disjoint single-key sets)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "q_agg_filtered",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_quantity > 25) AS n_big,
           count(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0 END), 4) AS sum_f_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12 filtered/conditional aggregation (Trino count_if / FILTER)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
        F.count_if(F.col("l_discount") == 0.0).alias("n_nodisc"),
        r4(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice")).otherwise(0.0))).alias("sum_f_price"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)            AS sd_qty,
           round(var_samp(l_quantity), 4)               AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4)  AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13 statistical aggregates. Spark `percentile` is the exact
    interpolated quantile — same definition as DuckDB quantile_cont
    (Trino's approx_percentile is sketch-based; the exact form is the
    oracle-checkable one)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r4(F.stddev_samp("l_quantity")).alias("sd_qty"),
        r4(F.var_samp("l_quantity")).alias("var_qty"),
        r4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        r4(F.covar_samp("l_quantity", "l_extendedprice")).alias("cov_qty_price"),
        r4(F.percentile("l_extendedprice", 0.5)).alias("median_price"),
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT n_nationkey,
           string_agg(CAST(s_suppkey AS VARCHAR), ',' ORDER BY s_suppkey) AS supp_keys
    FROM nation JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    tags=("agg",),
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E34 ordered array_agg (Trino array_agg(x ORDER BY y) / listagg).

    Spark collect_list is unordered across partitions → sort the array
    then render to string (deterministic, engine-neutral form).
    """
    nat = t(spark, sf_dir, "nation")
    supp = t(spark, sf_dir, "supplier")
    return (
        nat.join(supp, supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s_suppkey")), lambda v: v.cast("string")),
                ",",
            ).alias("supp_keys")
        )
    )


@query(
    "q_agg_pivot",
    oracle="""
    SELECT o_orderstatus,
           round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 0), 4) AS urgent,
           round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '2-HIGH'), 0), 4) AS high,
           round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '5-LOW'), 0), 4) AS low
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "pivot"),
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: rotate o_orderpriority values into columns of per-status
    price sums. Spark's groupBy().pivot() with an EXPLICIT value list —
    without it Spark runs an extra distinct-values job first, a full
    pass over the table a 100-TB query can't afford. Plans as one hash
    aggregate (each pivot cell a conditional agg); the oracle states the
    same query as portable conditional aggregation.
    """
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "5-LOW"])
        .sum("o_totalprice")
    )
    return piv.select(
        "o_orderstatus",
        r4(F.coalesce(F.col("`1-URGENT`"), F.lit(0.0))).alias("urgent"),
        r4(F.coalesce(F.col("`2-HIGH`"), F.lit(0.0))).alias("high"),
        r4(F.coalesce(F.col("`5-LOW`"), F.lit(0.0))).alias("low"),
    )


@query(
    "q_agg_unpivot",
    oracle="""
    SELECT p_partkey, metric, round(val, 4) AS val
    FROM (
        SELECT p_partkey, 'retail' AS metric, p_retailprice AS val FROM part
        UNION ALL
        SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    )
    WHERE p_partkey <= 100
    """,
    tags=("agg", "pivot"),
)
def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long): melt measure columns into (metric, val)
    rows via DataFrame.unpivot — one scan-local expand, no shuffle and
    no per-column self-union (the oracle's UNION ALL form reads the
    table once per measure; at 100 TB the single-scan expand wins).
    """
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return (
        p.select("p_partkey", F.col("p_retailprice").alias("retail"),
                 F.col("p_size").cast("double").alias("size"))
        .unpivot(["p_partkey"], ["retail", "size"], "metric", "v")
        .select("p_partkey", "metric", r4(F.col("v")).alias("val"))
    )


@query(
    "q_agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() marker columns on a rollup — how consumers tell a real
    NULL group key from a subtotal row (E11 companion; Trino and Spark
    share the bit semantics). Same single-shuffle rollup plan as
    q_agg_rollup; the markers are free metadata from the expand node."""
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n")
    )


@query("q_agg_approx_percentile", oracle=None, tags=("agg", "approx"))
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino approx_percentile parity: t-digest-style sketch quantiles
    (Spark's approx_percentile, accuracy 10000 → rank error ≤ N/10000).
    Sketch internals are engine-specific → rows-only driver check; the
    unit test brackets each estimate between exact neighboring quantiles
    (tests/test_bounds.py). One partial+final agg; the sketch (not the
    data) crosses the wire, so the shuffle is |groups|·sketch-size."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("p50"),
            F.expr("approx_percentile(o_totalprice, 0.95, 10000)").alias("p95"),
        )
    )
