"""Sort, limit/top-k, offset, and set operators — SURVEY.md §2.2 E17–E22.

Engine-delegated in the reference. Scale notes:
- global ORDER BY = range-partitioned shuffle (sampled split points);
  ORDER BY + LIMIT k = per-partition top-K (TakeOrderedAndProject), no
  global sort — prefer the latter at 100 TB.
- UNION ALL is a zero-shuffle concatenation; the DISTINCT variants add
  one hash shuffle on all columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import t
from okera_trino_spark.registry import query


@query(
    "q_sort_multi",
    oracle="""
    SELECT c_custkey, c_mktsegment, nullif(c_acctbal, 0.0) AS bal,
           row_number() OVER (ORDER BY nullif(c_acctbal, 0.0) DESC NULLS LAST,
                              c_mktsegment ASC, c_custkey) AS sort_pos
    FROM customer
    """,
    tags=("sort",),
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17 multi-key sort with NULLS LAST. The driver's hash is
    order-insensitive, so the sort position is materialized per row —
    making order itself checkable — via the SCALABLE two-phase global
    row-number (global_sort_positions below): range shuffle + per-range
    row_number + constant-size offsets. No partition-less Window
    anywhere (suite-wide guard, tests/test_plans.py)."""
    cust = t(spark, sf_dir, "customer")
    bal = F.nullif(F.col("c_acctbal"), F.lit(0.0))
    pre = cust.select("c_custkey", "c_mktsegment", bal.alias("bal"))
    return global_sort_positions(
        pre,
        F.col("bal").desc_nulls_last(), F.col("c_mktsegment").asc(),
        F.col("c_custkey"),
    )


def grouped_sort_positions(df: DataFrame, group_col: str, *order_cols,
                           n_ranges: int = 32,
                           pos_col: str = "sort_pos") -> DataFrame:
    """Per-GROUP total-order position (1-based within each group) — the
    grouped generalization of global_sort_positions, for per-group
    quantile/ntile assignment where a plain
    ``Window.partitionBy(group)`` would funnel a popular group (50% of
    a 100-TB corpus is one language) through ONE reducer.

    Same two-phase shape: range-shuffle on (group, *order) — ranges
    respect the composite total order, so within a group the ranges are
    still ordered — then row_number within (range, group) in parallel,
    plus each (range, group)'s starting offset within its group. The
    offsets job collects ≤ n_ranges × |groups| rows (groups are
    bounded: languages, sources — the caller's contract), folded into
    a two-level broadcast map literal (range → (group → offset)) so a
    group value can never collide with the map's key encoding and
    non-string group types look up natively (r12 ADVICE replaced the
    earlier 'range|group' string key, which a '|' in the group value
    could alias). Group values must be NON-NULL — part of the caller
    contract, enforced here with a clear error. The same
    materialize-the-range-shuffle-once rule as the global helper
    applies (RangePartitioner resamples split points per job)."""
    gcol = F.col(group_col)
    ranged = df.repartitionByRange(n_ranges, gcol, *order_cols) \
        .withColumn("_range", F.spark_partition_id()) \
        .localCheckpoint()
    raw = ranged.groupBy(F.col("_range"), gcol.alias("_g")) \
        .agg(F.count("*").alias("n")).collect()
    if any(r["_g"] is None for r in raw):
        raise ValueError(
            f"grouped_sort_positions: NULL value in group column "
            f"{group_col!r} — the helper's contract requires non-null "
            f"groups (filter or coalesce NULLs first)")
    counts = sorted(((r["_range"], r["_g"]), r["n"]) for r in raw)
    # Key literals are cast to the group column's ACTUAL dataType: a
    # Python int collected from a LongType column round-trips as
    # IntegerType when it fits int32, and element_at(map<int,...>,
    # long_col) relies on a legacy implicit cast that ANSI mode
    # (spark.sql.ansi.enabled=true) rejects at analysis (r13 ADVICE).
    # The _range side is IntegerType on both key and lookup
    # (spark_partition_id) — cast pinned anyway for the same reason.
    gtype = df.schema[group_col].dataType
    per_range: dict[int, list] = {}
    acc: dict = {}
    for (pid, g), n in counts:
        per_range.setdefault(pid, []).extend(
            (F.lit(g).cast(gtype), F.lit(acc.get(g, 0))))
        acc[g] = acc.get(g, 0) + n
    if per_range:
        outer = []
        for pid, kvs in per_range.items():
            outer += [F.lit(pid).cast("int"), F.create_map(*kvs)]
        off = F.element_at(
            F.element_at(F.create_map(*outer),
                         F.col("_range").cast("int")), gcol)
    else:
        off = F.lit(0)
    w = Window.partitionBy("_range", group_col).orderBy(*order_cols)
    return (
        ranged.withColumn(pos_col,
                          (F.row_number().over(w) + off).cast("long"))
        .drop("_range")
    )


def global_sort_positions(df: DataFrame, *order_cols,
                          n_ranges: int = 32,
                          pos_col: str = "sort_pos") -> DataFrame:
    """Total-order position for every row, the way it scales: the
    canonical two-phase global row-number (the reference engine sorts
    globally on the coordinator; a 1000-executor global window would
    funnel 100 TB through ONE reducer).

    1. range-shuffle on the sort key (sampled split points — the same
       exchange a global ORDER BY plans), so range i's rows all precede
       range i+1's;
    2. row_number WITHIN each range partition (parallel);
    3. add each range's starting offset — a constant-size (≤ n_ranges
       rows) count-per-range job folded into a broadcast map literal.

    The per-range counts job is one extra scan-and-count action, O(1)
    driver data — same sanctioned shape as the IVF codebook collect
    (llm/similarity.py).

    CRITICAL: the range shuffle is materialized ONCE (localCheckpoint)
    before either consumer runs. RangePartitioner samples its split
    points per job; without the checkpoint the counts job and the window
    job can observe DIFFERENT boundaries once the sampler subsamples
    (≳100k rows/partition), attaching offsets to the wrong ranges —
    silently duplicated/missing positions. Measured live at 300k rows /
    2 input partitions before the fix (tests/test_global_sort.py pins
    the regime). The checkpoint is one dataset-sized materialization —
    the same price a sort-merge shuffle already pays — and truncates
    lineage so the window job re-reads shuffled blocks instead of
    re-scanning + re-sampling."""
    ranged = df.repartitionByRange(n_ranges, *order_cols) \
        .withColumn("_range", F.spark_partition_id()) \
        .localCheckpoint()
    counts = sorted(
        (r["_range"], r["n"]) for r in
        ranged.groupBy("_range").agg(F.count("*").alias("n")).collect())
    offsets, acc = [], 0
    for pid, n in counts:
        offsets += [F.lit(pid), F.lit(acc)]
        acc += n
    off = F.element_at(F.create_map(*offsets), F.col("_range")) if offsets else F.lit(0)
    w = Window.partitionBy("_range").orderBy(*order_cols)
    return (
        ranged.withColumn(pos_col, (F.row_number().over(w) + off).cast("long"))
        .drop("_range")
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18 Top-K: compiles to TakeOrderedAndProject — each task keeps a
    k-element heap; only k·partitions rows reach the driver-side merge."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 50
    """,
    tags=("sort", "limit"),
)
def q_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E19 pagination: deterministic ordering + offset(50).limit(20)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(50)
        .limit(20)
    )


@query(
    "q_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
    tags=("set",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E20 UNION ALL (bag union) — pure concatenation, no shuffle."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.union(s)


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("set",),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E20 UNION (set union) = concat + one hash-distinct shuffle."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("set",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E21 INTERSECT (distinct semantics) — nations having both
    customers and suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("set",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E21 EXCEPT (distinct semantics) — nations with customers but no
    suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "q_intersect_all",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_linenumber = 1
    INTERSECT ALL
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_linenumber = 2
    """,
    tags=("set",),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E21 INTERSECT ALL (bag semantics, multiplicity = min of sides)."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_linenumber") == 2).select(F.col("l_suppkey").alias("suppkey"))
    return a.intersectAll(b)


@query(
    "q_except_all",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_linenumber = 1
    EXCEPT ALL
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_linenumber = 2
    """,
    tags=("set",),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E21 EXCEPT ALL (bag semantics, multiplicity subtraction)."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_linenumber") == 2).select(F.col("l_suppkey").alias("suppkey"))
    return a.exceptAll(b)


@query(
    "q_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    tags=("set",),
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22 SELECT DISTINCT = hash aggregate on all columns; partial
    dedup map-side keeps the shuffle at |distinct| not |rows|."""
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
