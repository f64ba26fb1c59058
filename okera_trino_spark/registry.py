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
#: ROUND-3 ROTATION: the r1/r2 windows drove 78 keys green; this window
#: hands its 50 slots to the keys that have NEVER had a driver row
#: (round-1/2 additions past the old window) plus this round's two new
#: keys — after r3 the union covers 128/133 registered keys. No canary
#: slots: every candidate canary already has a green driver row, the
#: flagship is smoke-checked via entry() every round regardless, and all
#: 133 keys remain gated by tests/test_oracle_parity.py (the identical
#: comparison) locally. Leftovers (never driver-checked, local-only):
#: the three rows-only sampling/ANN keys (q_llm_ann_ivf/ann_lsh/
#: q_llm_stratified — bounds-tested), q_agg_approx_percentile (bounds-
#: tested), and q_llm_text_stats (benched since r1).
_PRIORITY: tuple[str, ...] = (
    # TPC-H composites never driver-checked (§2.5)
    "q_tpch_q4", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8",
    "q_tpch_q10", "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q17",
    "q_tpch_q19", "q_tpch_q22",
    # events analytics + profiling (§2.5)
    "q_events_funnel", "q_events_gapfill", "q_events_retention",
    "q_profile_orders",
    # scalar/extras fn surface (E25–E29 tails)
    "q_fn_math", "q_fn_map", "q_fn_struct", "q_fn_regex", "q_fn_bitwise",
    "q_fn_try", "q_fn_url", "q_fn_interval", "q_fn_decimal",
    # aggregate tails (E11, E34)
    "q_agg_pivot", "q_agg_unpivot", "q_agg_grouping_id", "q_agg_minmax_by",
    "q_agg_bool", "q_agg_listagg",
    # window/sort/nested/UDF tails (E14, E17, E30, C17)
    "q_win_ntile", "q_win_dist", "q_sort_nulls", "q_unnest_ordinality",
    "q_udf_current_db",
    # streaming tails (S2, S5, S6 extension)
    "q_stream_slide", "q_stream_dedup", "q_stream_stream_join",
    # LLM keys never driver-checked (§2.4)
    "q_llm_knn_join", "q_llm_pii_scrub", "q_llm_pack", "q_llm_pipeline",
    "q_llm_frame_sample", "q_llm_dedup_simhash", "q_llm_tokens",
    "q_llm_fingerprint", "q_llm_langid",
    # new this round (E2 right outer; SimHash Hamming pairing)
    "q_join_right", "q_llm_dedup_simhash_pairs",
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
