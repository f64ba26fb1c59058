"""Scalar-function surface — SURVEY.md §2.2 E25–E29 (conditionals,
strings, regex, datetime, math, casts).

Engine-delegated in the reference (Trino 400 function library). Every
expression here is a Spark builtin (JVM codegen, no Python) chosen in a
form whose semantics agree bit-for-bit with the DuckDB oracle; known
divergences (DuckDB ceil→DECIMAL, double→int cast rounds vs truncates,
dayofweek origin) are avoided or normalized explicitly — see each
oracle's casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.functions import trino_compat as tc
from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query


@query(
    "q_case_expr",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_class,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           if(o_orderpriority = '1-URGENT', 1, 0) AS is_urgent,
           least(o_totalprice, 250000.0) AS capped,
           greatest(o_totalprice, 50000.0) AS floored
    FROM orders
    """,
    tags=("function",),
)
def q_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E25 conditional expressions: CASE/coalesce/nullif/if/least/greatest."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small").alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status_or_open"),
        tc.if_(F.col("o_orderpriority") == "1-URGENT", F.lit(1), F.lit(0)).alias("is_urgent"),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("capped"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floored"),
    )


@query(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS lname,
           upper(c_mktsegment) AS useg,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           c_name || '/' || c_mktsegment AS name_seg,
           replace(c_mktsegment, 'I', '!') AS seg_repl,
           trim('  pad  ') AS trimmed,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nat_code,
           reverse(c_mktsegment) AS seg_rev,
           strpos(c_name, '0') AS first_zero
    FROM customer
    """,
    tags=("function",),
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E26 string functions incl. the Trino strpos shim (arg order
    differs from Spark locate — functions/trino_compat.py)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.replace(F.col("c_mktsegment"), F.lit("I"), F.lit("!")).alias("seg_repl"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nat_code"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        tc.strpos("c_name", "0").alias("first_zero"),
    )


@query(
    "q_fn_regex",
    oracle="""
    SELECT p_partkey, p_brand,
           regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
           regexp_matches(p_type, '^[a-f]') AS starts_af,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CASE WHEN p_type LIKE '%steel%' THEN 1 ELSE 0 END AS is_steel
    FROM part
    """,
    tags=("function",),
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E26 regex functions (Trino regexp_like → Spark rlike; DuckDB
    regexp_replace needs the 'g' flag to match Spark's replace-all).
    Patterns restricted to syntax with identical Java/RE2 semantics."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey", "p_brand",
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.col("p_type").rlike("^[a-f]").alias("starts_af"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.when(F.col("p_type").like("%steel%"), 1).otherwise(0).alias("is_steel"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           quarter(o_orderdate) AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_day,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k
    FROM orders
    """,
    tags=("function",),
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E27 datetime functions via the Trino-order shims (date_add /
    date_diff / date_trunc take the unit first in Trino; Spark's
    date_add is days-only with reversed args — trino_compat normalizes).
    Temporal outputs rendered as ISO strings (engine-neutral)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(tc.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(tc.date_add("day", 30, "o_orderdate"), "yyyy-MM-dd").alias("due_day"),
        tc.date_diff("day", F.col("o_orderdate"),
                     F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")).cast("bigint").alias("days_to_y2k"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 950.0) AS dev,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           round(p_retailprice, 1) AS price_r1,
           round(sqrt(p_retailprice), 6) AS price_sqrt,
           round(pow(p_size, 2.0), 4) AS size_sq,
           round(ln(p_retailprice), 6) AS price_ln,
           round(log10(p_retailprice), 6) AS price_log10,
           p_size % 7 AS size_mod,
           CAST(sign(p_retailprice - 950.0) AS INT) AS dev_sign
    FROM part
    """,
    tags=("function",),
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E28 math functions. Type normalization: Spark ceil/floor →
    BIGINT while DuckDB → DECIMAL (cast), Spark signum → DOUBLE while
    DuckDB sign → TINYINT (cast both to INT). Transcendentals rounded
    to 6dp — libm last-bit drift across engines."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 950.0).alias("dev"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.round("p_retailprice", 1).alias("price_r1"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.pow("p_size", F.lit(2.0)), 4).alias("size_sq"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.log10("p_retailprice"), 6).alias("price_log10"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.signum(F.col("p_retailprice") - 950.0).cast("int").alias("dev_sign"),
    )


@query(
    "q_fn_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS VARCHAR) AS line_str,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(l_linenumber AS DOUBLE) / 2 AS half_line,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS line_roundtrip
    FROM lineitem
    """,
    tags=("function",),
)
def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E29 casts. l_quantity is integral-valued so DOUBLE→BIGINT agrees
    despite DuckDB rounding vs Spark truncating on non-integral input
    (that divergence is intentionally not exercised — Trino errors
    there instead, a third behavior). try_cast('A') → NULL both."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        (F.col("l_linenumber").cast("double") / 2).alias("half_line"),
        F.expr("try_cast(l_returnflag AS int)").alias("flag_as_int"),
        F.col("l_linenumber").cast("string").cast("int").alias("line_roundtrip"),
    )
