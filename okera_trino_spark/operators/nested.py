"""Complex-type operators — SURVEY.md §2.1 C9–C10, §2.2 E30–E33.

The reference decodes ARRAY/MAP/STRUCT через a row cursor with recursive
converters (RecordServiceRecordSet.java:52-271, RecordServiceUtil.java:
187-492); Spark's parquet reader + expression library subsume both.
No fixture table carries struct/map columns (FIXTURES.md note), so
nested values are synthesized in-query from flat inputs — identically
in Spark and the DuckDB oracle — then navigated back out to flat,
engine-neutral outputs (arrays render via array_join; struct/map access
yields scalars).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.functions import trino_compat as tc
from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query


@query(
    "q_fn_array",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_words,
           array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS uniq_words,
           string_split(p_name, ' ')[1] AS first_word,
           list_contains(string_split(p_name, ' '), 'steel') AS has_steel,
           array_to_string(list_transform([p_size, p_size + 1, p_size + 2], x -> x * 10), ',') AS sizes_x10,
           CAST(list_aggregate([p_size, p_size + 1, p_size + 2], 'sum') AS BIGINT) AS size_sum,
           array_to_string(list_filter([p_size - 1, p_size, p_size + 1], x -> x % 2 = 0), ',') AS even_sizes
    FROM part
    """,
    tags=("nested", "array"),
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E30 array functions incl. higher-order lambdas (transform /
    filter / aggregate — Catalyst evaluates them JVM-side, no UDF).
    cardinality → size shim; element_at is 1-based in both engines."""
    p = t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    sizes = F.array(F.col("p_size"), F.col("p_size") + 1, F.col("p_size") + 2)
    return p.select(
        "p_partkey",
        tc.cardinality(words).alias("n_words"),
        F.array_join(F.array_sort(F.array_distinct(words)), ",").alias("uniq_words"),
        F.element_at(words, 1).alias("first_word"),
        tc.contains(words, "steel").alias("has_steel"),
        F.array_join(F.transform(sizes, lambda x: (x * 10).cast("string")), ",").alias("sizes_x10"),
        F.aggregate(sizes, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("size_sum"),
        F.array_join(
            F.transform(
                F.filter(F.array(F.col("p_size") - 1, F.col("p_size"), F.col("p_size") + 1),
                         lambda x: x % 2 == 0),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("even_sizes"),
    )


@query(
    "q_unnest",
    oracle="""
    SELECT w.word, count(*) AS n
    FROM part p, unnest(string_split(p.p_name, ' ')) AS w(word)
    GROUP BY w.word
    """,
    tags=("nested", "array"),
)
def q_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E30 UNNEST → explode. At scale explode multiplies rows before
    the aggregation; the partial (map-side) count keeps the shuffle at
    |vocabulary| rows."""
    p = t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_fn_map",
    oracle="""
    SELECT o_orderkey,
           array_to_string(map_keys(MAP {'status': o_orderstatus, 'priority': o_orderpriority}), ',') AS mkeys,
           array_to_string(map_values(MAP {'status': o_orderstatus, 'priority': o_orderpriority}), ',') AS mvals,
           (MAP {'status': o_orderstatus, 'priority': o_orderpriority})['status'][1] AS status_val,
           cardinality(MAP {'status': o_orderstatus, 'priority': o_orderpriority}) AS msize
    FROM orders
    """,
    tags=("nested", "map"),
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E31 map functions (C10 map materialization,
    RecordServiceUtil.java:287-393 — keys non-null, values nullable).
    DuckDB map[key] yields a one-element list → [1] in the oracle;
    Spark element_at yields the value directly."""
    o = t(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m), ",").alias("mvals"),
        F.element_at(m, "status").alias("status_val"),
        F.size(m).alias("msize"),
    )


@query(
    "q_fn_struct",
    oracle="""
    SELECT struct_pack(okey := o_orderkey, price := o_totalprice).okey AS okey,
           struct_pack(okey := o_orderkey, price := o_totalprice).price AS price,
           struct_pack(a := struct_pack(b := o_orderstatus)).a.b AS nested_field
    FROM orders
    """,
    tags=("nested", "struct"),
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E33 ROW construction + field access (C10 struct materialization,
    RecordServiceUtil.java:398-492; field names lower-cased per
    RecordServiceMetadata.java:740-749). Two-level nesting exercises
    recursive access; outputs are the extracted scalars."""
    o = t(spark, sf_dir, "orders")
    s = F.struct(F.col("o_orderkey").alias("okey"), F.col("o_totalprice").alias("price"))
    nested = F.struct(F.struct(F.col("o_orderstatus").alias("b")).alias("a"))
    return o.select(
        s.getField("okey").alias("okey"),
        s.getField("price").alias("price"),
        nested.getField("a").getField("b").alias("nested_field"),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END AS has_k
    FROM events
    """,
    tags=("nested", "json"),
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E32 JSON functions over events.props (Trino json_extract_scalar →
    get_json_object shim)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        tc.json_extract_scalar("props", "$.k").alias("k_str"),
        tc.json_extract_scalar("props", "$.k").cast("int").alias("k_int"),
        F.when(tc.json_extract("props", "$.k").isNotNull(), 1).otherwise(0).alias("has_k"),
    )


@query(
    "q_scan_nested",
    oracle="""
    SELECT e.event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(e.props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract(e.props, '$.k') AS INTEGER)), 4) AS avg_k
    FROM events e
    GROUP BY e.event_type
    """,
    tags=("nested", "scan"),
)
def q_scan_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9/C10 nested read path: parse props → typed struct (from_json),
    navigate the struct, aggregate. Spark's schema-based from_json is
    the vectorized analogue of the reference's recursive row-cursor
    converters (RecordServiceRecordSet.java:52-271)."""
    e = t(spark, sf_dir, "events")
    parsed = e.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("p").getField("k")).alias("sum_k"),
            r4(F.avg(F.col("p").getField("k"))).alias("avg_k"),
        )
    )
