"""Extended scalar/aggregate surface — Trino-400 functions beyond the
core E25–E35 batch (SURVEY.md §2.2): bitwise ops, min_by/max_by,
boolean aggregates, ordered string aggregation (listagg), the TRY
family, UNNEST WITH ORDINALITY, URL extraction, interval arithmetic,
and value-distribution window functions.

Everything is a built-in expression (whole-stage codegen; no Python);
every oracle restates the same computation in DuckDB's dialect, with
Trino-name ↔ Spark-name mappings noted per query (the shim catalog in
functions/trino_compat.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query


@query(
    "q_fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS b_and,
           o_orderkey | 15 AS b_or,
           xor(o_orderkey, 85) AS b_xor,
           o_orderkey << 2 AS b_shl,
           o_orderkey >> 3 AS b_shr,
           ~o_orderkey AS b_not
    FROM orders WHERE o_orderkey < 100
    """,
    tags=("function", "bitwise"),
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino bitwise_and/or/xor + shifts (Spark: column operators and
    shiftleft/shiftright — same two's-complement semantics on BIGINT)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(255).alias("b_and"),
        k.bitwiseOR(15).alias("b_or"),
        k.bitwiseXOR(85).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 3).alias("b_shr"),
        F.bitwise_not(k).alias("b_not"),
    )


@query(
    "q_agg_minmax_by",
    oracle="""
    SELECT l_returnflag,
           arg_max(l_orderkey, l_extendedprice) AS top_order,
           arg_min(l_orderkey, l_extendedprice) AS bottom_order,
           round(max(l_extendedprice), 4) AS top_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino max_by/min_by (DuckDB arg_max/arg_min; Spark max_by/min_by).
    Fixture prices are unique per flag partition at fixture scales, so
    the argmax is well-defined; a production query would add a tie-break
    via max_by(struct(price, key))."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.max_by("l_orderkey", "l_extendedprice").alias("top_order"),
            F.min_by("l_orderkey", "l_extendedprice").alias("bottom_order"),
            r4(F.max("l_extendedprice")).alias("top_price"),
        )
    )


@query(
    "q_agg_bool",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           count(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino bool_and/bool_or/every — Spark bool_and/bool_or (partial
    agg: each partition reduces to one boolean per group)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q_agg_listagg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("agg",),
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino listagg(x, ',') WITHIN GROUP (ORDER BY x): Spark has no
    ordered string_agg, so the deterministic form is
    concat_ws(array_sort(collect_list(x))) — sort applied after
    collection makes the result order-stable regardless of partitioning
    (collect_list order is otherwise nondeterministic under retries)."""
    n = t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"))
    )


@query(
    "q_fn_try",
    oracle="""
    SELECT doc_id,
           TRY_CAST(lang AS INTEGER) AS lang_as_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INTEGER) AS chars_roundtrip,
           CASE WHEN (doc_id % 5) = 0 THEN NULL
                ELSE round(n_chars * 1.0 / (doc_id % 5), 4) END AS safe_div
    FROM documents WHERE doc_id < 100
    """,
    tags=("function",),
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino TRY(expr) / TRY_CAST: errors become NULL. Spark equivalents
    are try_cast/try_divide (NULL-on-error regardless of ANSI mode) —
    the q_fn_cast key covers plain CAST; this one covers the error-
    absorbing forms (bad string→int casts, division by zero)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.expr("try_cast(lang AS int)").alias("lang_as_int"),
        F.expr("try_cast(cast(n_chars AS string) AS int)").alias("chars_roundtrip"),
        r4(F.try_divide(F.col("n_chars"), F.col("doc_id") % 5)).alias("safe_div"),
    )


@query(
    "q_unnest_ordinality",
    oracle="""
    SELECT doc_id,
           unnest(str_split_regex(trim(text), ' +')) AS word,
           generate_subscripts(str_split_regex(trim(text), ' +'), 1) AS ordinality
    FROM documents WHERE doc_id < 20
    """,
    tags=("nested",),
)
def q_unnest_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino UNNEST WITH ORDINALITY → Spark posexplode (0-based pos;
    +1 to match SQL's 1-based ordinality)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select("doc_id",
                 F.posexplode(F.split(F.trim(F.col("text")), " +")).alias("pos0", "word"))
        .select("doc_id", "word", (F.col("pos0") + 1).alias("ordinality"))
    )


@query(
    "q_fn_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || doc_id
                 || '?lang=' || lang AS url
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_param
    FROM u
    """,
    tags=("function", "url"),
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino url_extract_host/path/parameter → Spark parse_url. The
    oracle restates via regexp (DuckDB has no URL functions) — the
    Spark side uses the real parse_url so the engine surface is the
    native one."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    url = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
                   F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"))
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "q_fn_interval",
    oracle="""
    SELECT event_id,
           strftime(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS plus_90m,
           strftime(ts - INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS minus_1d,
           strftime(ts + INTERVAL 2 MONTH, '%Y-%m-%d %H:%M:%S') AS plus_2mo,
           CAST(date_diff('minute', date_trunc('day', ts), ts) AS BIGINT) AS mins_into_day
    FROM events WHERE event_id < 100
    """,
    tags=("function", "date"),
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic (Trino ts + INTERVAL '90' MINUTE etc.) and
    date_diff against a truncation boundary. Month addition uses
    calendar semantics in both engines (end-of-month clamping)."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    fmt = "yyyy-MM-dd HH:mm:ss"
    return e.select(
        "event_id",
        F.date_format(F.col("ts") + F.expr("INTERVAL 90 MINUTE"), fmt).alias("plus_90m"),
        F.date_format(F.col("ts") - F.expr("INTERVAL 1 DAY"), fmt).alias("minus_1d"),
        F.date_format(F.col("ts") + F.expr("INTERVAL 2 MONTH"), fmt).alias("plus_2mo"),
        F.expr("timestampdiff(MINUTE, date_trunc('day', ts), ts)")
         .cast("bigint").alias("mins_into_day"),
    )


@query(
    "q_fn_decimal",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR) AS dec_sum,
           CAST(CAST(CAST(max(l_extendedprice) AS DECIMAL(12,2)) * CAST(0.08 AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS VARCHAR) AS dec_tax,
           CAST(CAST(min(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR) AS dec_min
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("function", "decimal"),
)
def q_fn_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL(p,s) arithmetic (E29/§1.2): exact fixed-point sum, scaled
    multiplication, min — the money-math path. Results are rendered
    through an explicit DECIMAL cast then VARCHAR in BOTH engines, so
    the comparison pins scale semantics (trailing zeros included), not
    just numeric value. The fixtures carry no decimal columns, so the
    cast from double is part of the query on both sides."""
    li = t(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(12,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(dec).cast("decimal(18,2)").cast("string").alias("dec_sum"),
            (F.max("l_extendedprice").cast("decimal(12,2)")
             * F.lit(0.08).cast("decimal(4,2)"))
            .cast("decimal(18,4)").cast("string").alias("dec_tax"),
            F.min(dec).cast("decimal(18,2)").cast("string").alias("dec_min"),
        )
    )


@query(
    "q_sort_nulls",
    oracle="""
    WITH v(grp, x) AS (
        VALUES ('a', 3), ('a', NULL), ('a', 1), ('b', NULL),
               ('b', 7), ('c', 2), ('c', NULL), ('c', 9)
    )
    SELECT grp, x,
           row_number() OVER (ORDER BY x DESC NULLS LAST, grp) AS rn_desc_nl,
           row_number() OVER (ORDER BY x ASC NULLS FIRST, grp) AS rn_asc_nf
    FROM v
    """,
    tags=("sort", "nulls"),
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-ordering semantics (E17, SURVEY §5.4): DESC NULLS LAST and
    ASC NULLS FIRST over inline VALUES carrying NULLs (the fixtures are
    NULL-free). The orderings are materialized as row_numbers so the
    driver's order-insensitive hash still verifies the ORDER — each
    row carries its position under both orderings."""
    from pyspark.sql import Window

    v = spark.createDataFrame(
        [("a", 3), ("a", None), ("a", 1), ("b", None),
         ("b", 7), ("c", 2), ("c", None), ("c", 9)],
        "grp string, x int",
    )
    w_desc = Window.orderBy(F.col("x").desc_nulls_last(), F.col("grp"))
    w_asc = Window.orderBy(F.col("x").asc_nulls_first(), F.col("grp"))
    return v.select(
        "grp", "x",
        F.row_number().over(w_desc).alias("rn_desc_nl"),
        F.row_number().over(w_asc).alias("rn_asc_nf"),
    )


@query(
    "q_win_dist",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cume
    FROM orders
    WHERE o_orderkey < 500
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window",),
)
def q_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-distribution window functions percent_rank/cume_dist
    (Trino + Spark built-ins, identical semantics). Key tie-break in the
    ordering keeps ranks deterministic."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderstatus",
        r4(F.percent_rank().over(w)).alias("pct_rank"),
        r4(F.cume_dist().over(w)).alias("cume"),
    )


@query(
    "q_agg_histogram",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000 THEN 21
                ELSE CAST(1 + floor(o_totalprice / 30000.0) AS BIGINT) END AS bucket,
           count(*) AS n,
           round(min(o_totalprice), 4) AS lo,
           round(max(o_totalprice), 4) AS hi
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("aggregate", "profile"),
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (width_bucket semantics: bucket 0 =
    underflow, num+1 = overflow) — the distribution-profiling aggregate
    behind stats pages, CBO histograms, and skew diagnosis. The bucket
    arithmetic is written EXPLICITLY and identically on both engines
    (DuckDB has no width_bucket; the same double division + floor on
    both sides makes the boundary behavior bit-identical). Partial
    aggregation keeps the shuffle at |buckets| rows — profiling a
    100 TB column moves 22 rows."""
    o = t(spark, sf_dir, "orders")
    v = F.col("o_totalprice")
    bucket = (
        F.when(v < 0, F.lit(0))
        .when(v >= 600000, F.lit(21))
        .otherwise((F.floor(v / 30000.0) + 1))
    ).cast("bigint")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"),
             F.round(F.min("o_totalprice"), 4).alias("lo"),
             F.round(F.max("o_totalprice"), 4).alias("hi"))
        .orderBy("bucket")
    )


@query(
    "q_agg_numeric_histogram_det",
    oracle="""
    SELECT bucket, count(*) AS n,
           round(avg(o_totalprice), 4) AS center,
           round(min(o_totalprice), 4) AS lo,
           round(max(o_totalprice), 4) AS hi
    FROM (SELECT o_totalprice,
                 ntile(8) OVER (ORDER BY o_totalprice, o_orderkey)
                     AS bucket
          FROM orders) b
    GROUP BY bucket ORDER BY bucket
    """,
    tags=("aggregate", "profile"),
)
def q_agg_numeric_histogram_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic equi-DEPTH histogram (r11) — the hash-green twin
    of Trino's ``numeric_histogram(b, x)`` (reference surface:
    Trino-400 engine functions), whose Ben-Haim & Tom-Tov streaming
    bucketer is input-order-dependent and therefore refused by name in
    the dialect (``functions/trino_sql.py``). The twin fixes the
    bucket CONTENTS deterministically: the ANSI ntile assignment over
    a fully tie-broken order gives every engine identical equal-count
    buckets, and per-bucket (count, mean-center, lo, hi) mirrors the
    value→count shape numeric_histogram reports.

    Scale: a naive ``ntile(8) OVER (ORDER BY …)`` is a partition-less
    Window — 100 TB through ONE reducer (the suite-wide plan gate in
    tests/test_plans.py rejects it). Instead the global rank comes
    from the two-phase global_sort_positions helper (range shuffle +
    per-range row_number + constant-size offsets), the total count is
    a broadcast 1-row aggregate, and the bucket index is the closed-
    form ANSI ntile formula over (rank, n) — fully parallel, no
    global window anywhere."""
    from okera_trino_spark.operators.sorts_sets import (
        global_sort_positions,
    )

    o = t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    pos = global_sort_positions(
        o, F.col("o_totalprice").asc(), F.col("o_orderkey").asc(),
        pos_col="_pos")
    total = pos.agg(F.count("*").alias("_n"))
    k = 8
    j = pos.crossJoin(F.broadcast(total))
    size, rem = F.floor(F.col("_n") / k), F.col("_n") % k
    # ANSI ntile: the first (n % k) buckets hold floor(n/k)+1 rows.
    bucket = F.when(
        F.col("_pos") <= rem * (size + 1),
        F.ceil(F.col("_pos") / (size + 1)),
    ).otherwise(rem + F.ceil((F.col("_pos") - rem * (size + 1)) / size))
    return (
        j.select("o_totalprice", bucket.cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"),
             F.round(F.avg("o_totalprice"), 4).alias("center"),
             F.round(F.min("o_totalprice"), 4).alias("lo"),
             F.round(F.max("o_totalprice"), 4).alias("hi"))
        .orderBy("bucket")
    )
