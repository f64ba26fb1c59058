"""Central query registry — single source of truth for the driver contract.

Every operator key from SURVEY.md §2 registers here with:
  - a Spark callable ``(SparkSession, sf_dir) -> DataFrame``
  - an optional DuckDB oracle SQL string (``None`` → driver runs the
    weaker rows-only check; used for non-deterministic / non-SQL ops).

``__spark_entry__.py`` re-exports this registry as ``queries()`` /
``oracle_sql()``; tests/test_oracle_parity.py runs the same comparison
the driver does (row count + schema + order-insensitive value hash).

Column-name discipline: every computed column is aliased identically in
the Spark callable and the oracle SQL — the driver sorts columns by name
before hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


#: name -> QuerySpec. Populated by the @query decorator at module import.
QUERIES: dict[str, QuerySpec] = {}

#: Modules that define queries; imported lazily by load_all_queries().
_QUERY_MODULES = [
    "okera_trino_spark.operators.scan",
    "okera_trino_spark.operators.joins",
    "okera_trino_spark.operators.aggregates",
    "okera_trino_spark.operators.windows",
    "okera_trino_spark.operators.sorts_sets",
    "okera_trino_spark.operators.subqueries",
    "okera_trino_spark.operators.scalar_fns",
    "okera_trino_spark.operators.nested",
    "okera_trino_spark.operators.analytics",
    "okera_trino_spark.operators.analytics_ext",
    "okera_trino_spark.operators.tpch_full",
    "okera_trino_spark.operators.extras",
    "okera_trino_spark.operators.asof",
    "okera_trino_spark.operators.skew",
    "okera_trino_spark.operators.views_udfs",
    "okera_trino_spark.operators.pattern",
    "okera_trino_spark.streaming.windows",
    "okera_trino_spark.llm.dedup",
    "okera_trino_spark.llm.clusters",
    "okera_trino_spark.llm.contamination",
    "okera_trino_spark.llm.similarity",
    "okera_trino_spark.llm.text",
    "okera_trino_spark.llm.multimodal",
    "okera_trino_spark.functions.trino_sql",
]


def query(name: str, oracle: str | None = None,
          tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation under a SURVEY.md §2 key."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                  tags=tuple(tags), doc=(fn.__doc__ or "").strip())
        return fn

    return deco


#: Driver-window priority. The correctness driver records the FIRST 50 keys
#: of ``queries()`` in iteration order, so this list hand-picks one-or-more
#: representatives from EVERY SURVEY.md §2 family (§2.1 scan/pushdown, §2.2
#: joins/aggregates/windows/sorts-sets/subqueries/scalar-fns/nested/views-UDF,
#: §2.3 streaming, §2.4 LLM ops, §2.5 extensions: TPC-H composites, as-of,
#: salted-skew agg, applyInPandas). Keys not listed here keep their module
#: registration order after the priority block — they are still registered,
#: tested locally by tests/test_oracle_parity.py, and available to the driver.
#: ROUND-9 ROTATION (data-driven: slots ranked by last-green round
#: computed from CORRECTNESS_r01..r08). Slots, in order:
#:   1) the two r8 driver-reds — breadth2 (oracle HUGEINT drift) and
#:      breadth3 (nested-array canonicalizer crash) — both FIXED this
#:      round and still without a green driver row;
#:   2) the NEW r9 keys: q_trino_sql_ties (FETCH FIRST n ROWS WITH
#:      TIES → rank), q_trino_sql_jsonpath (json_query VARIANT
#:      lowering, wildcard + wrapper forms), q_trino_sql_mr_excl
#:      (quantified {- -} exclusions), q_trino_sql_xxhash64 (seed-0
#:      XXH64 varbinary via session UDF; q_fn_try yielded its slot) —
#:      new keys must sit in-window to keep the test_entry.py
#:      union-closure invariant green;
#:   3) keys whose implementation CHANGED in r9: q_trino_sql_listagg
#:      (struct sort → explicit comparator, DESC/NULLS keys),
#:      q_trino_sql_mr_running (RUNNING sum stays NULL until a
#:      non-null value accumulates — advice fix);
#:   4) the stalest greens: the full r2 cohort (16 keys, last green
#:      six rounds ago) and the 27 oldest r4 keys. The r8 window's 48
#:      greens all rotate OUT (fresh evidence last round); the r4/r5
#:      tail (q_scan_nested, q_fn_url, q_fn_decimal, streaming S1-S3,
#:      q_udf_current_db …) re-enters next rotation.
_PRIORITY: tuple[str, ...] = (
    # 1) r8 driver-reds, fixed in r9, no green row yet
    "q_trino_sql_breadth2", "q_trino_sql_breadth3",
    # 2) new in r9
    "q_trino_sql_ties", "q_trino_sql_jsonpath", "q_trino_sql_mr_excl",
    "q_trino_sql_xxhash64", "q_trino_sql_listagg_trunc",
    "q_trino_sql_breadth4",
    # 3) changed in r9
    "q_trino_sql_listagg", "q_trino_sql_mr_running",
    # 4a) r2-stale cohort (16)
    "q_project", "q_count_star", "q_agg_rollup", "q_agg_stats",
    "q_win_frame_range", "q_union_all", "q_subquery_corr",
    "q_case_expr", "q_fn_string", "q_fn_date", "q_fn_cast",
    "q_fn_array", "q_unnest", "q_udf_custom", "q_udtf_split",
    "q_stream_watermark",
    # 4b) r4-stale cohort (27)
    "q_join_right", "q_agg_pivot", "q_agg_unpivot",
    "q_agg_grouping_id", "q_win_ntile", "q_fn_regex", "q_fn_math",
    "q_fn_map", "q_fn_struct", "q_tpch_q5", "q_tpch_q10", "q_tpch_q4",
    "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q13", "q_tpch_q14",
    "q_tpch_q15", "q_tpch_q17", "q_tpch_q19", "q_tpch_q22",
    "q_profile_orders", "q_fn_bitwise", "q_agg_minmax_by",
)


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry,
    reordered so the driver's 50-key correctness window spans every
    SURVEY.md §2 family (see ``_PRIORITY``)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [k for k in _PRIORITY if k not in QUERIES]
    if missing:
        raise RuntimeError(f"_PRIORITY keys not registered: {missing}")
    ordered = {k: QUERIES[k] for k in _PRIORITY}
    ordered.update((k, s) for k, s in QUERIES.items() if k not in ordered)
    return ordered
