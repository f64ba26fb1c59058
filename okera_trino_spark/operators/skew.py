"""Skew mitigation operators — the 100-TB answer to hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; these utilities cover the cases AQE can't: aggregation skew
(one group key holding a large share of all rows) and deliberate
pre-salting for repeated hot-key joins.

Salted aggregation is registered as a driver-checked query: the oracle
is the PLAIN aggregation — the whole point is that salting changes the
execution shape, never the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query

#: Decomposable aggregates: partial form on the salted key, merge form
#: on the true key. (avg is handled as sum+count.)
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]],
               n_salts: int = 16) -> DataFrame:
    """Two-level aggregation: groupBy(keys + salt) → groupBy(keys).

    ``measures``: out_name → (agg, col) with agg ∈ sum/count/min/max.
    Level 1 spreads each hot key over ``n_salts`` reducers; level 2
    merges the ``n_salts`` partials per key — a shuffle of
    |keys|×n_salts rows, constant per key. Equivalent to the plain
    aggregation for every decomposable measure (that equivalence is
    what the oracle checks).

    ``spark_partition_id()`` supplies the salt: deterministic within a
    run, spreads by data placement, and costs nothing to compute (a
    ``rand()``-based salt would also work but breaks task retry
    determinism).
    """
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    partials = []
    finals = []
    for out, (agg, col) in measures.items():
        if agg == "count":
            partials.append(F.count(col).alias(f"_p_{out}"))
        else:
            partials.append(_MERGE[agg](col).alias(f"_p_{out}"))
        finals.append(_MERGE["sum" if agg == "count" else agg](f"_p_{out}").alias(out))
    level1 = df.groupBy(*keys, salt).agg(*partials)
    return level1.groupBy(*keys).agg(*finals)


def salt_explode_small_side(small: DataFrame, n_salts: int = 16) -> DataFrame:
    """Join-side salting: replicate the small side once per salt value
    so a salted big side still matches every row. Used when one join
    key dominates and the small side can't broadcast; pairs with
    ``big.withColumn("_salt", spark_partition_id() % n)``."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    return small.select("*", salts)


@query(
    "q_agg_salted",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           count(*) AS n_rows,
           round(max(l_extendedprice), 4) AS max_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "skew"),
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant aggregation: (returnflag, linestatus) has only ~6
    groups over the whole fact table — the textbook aggregation-skew
    shape (6 reducers do all the work at any scale). The salted
    two-level plan spreads each group across 16 partial reducers first.
    The oracle is the plain aggregation: identical result, different
    (skew-immune) execution."""
    li = t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag", "l_linestatus"],
        measures={
            "sum_qty_raw": ("sum", "l_quantity"),
            "n_rows": ("count", "l_quantity"),
            "max_price_raw": ("max", "l_extendedprice"),
        },
    )
    return out.select(
        "l_returnflag", "l_linestatus",
        r4(F.col("sum_qty_raw")).alias("sum_qty"),
        "n_rows",
        r4(F.col("max_price_raw")).alias("max_price"),
    )
