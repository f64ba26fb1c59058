"""Smoke tests for the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0


def test_driver_window_spans_all_families():
    """The correctness driver records only the first 50 keys of queries();
    pin one-representative-per-SURVEY-§2-family inside that window."""
    window = list(entrymod.queries())[:50]
    families = {
        "scan": "q_scan_full", "pushdown": "q_filter_range",
        "join": "q_join_inner", "banded_range": "q_join_range_banded",
        "agg": "q_agg_group", "skew": "q_agg_salted",
        "window_fn": "q_win_rank", "sort_set": "q_union_all",
        "subquery": "q_subquery_corr", "scalar_fn": "q_fn_string",
        "nested": "q_scan_nested", "views_udf": "q_udf_custom",
        "streaming": "q_stream_tumble", "tpch": "q_tpch_q3",
        "asof": "q_asof_join", "pandas": "q_pandas_group_norm",
        "llm_dedup": "q_llm_dedup_near", "llm_sim": "q_llm_similarity",
        "llm_text": "q_llm_curation", "llm_mm": "q_llm_multimodal",
    }
    missing = {f: k for f, k in families.items() if k not in window}
    assert not missing, f"families missing from driver window: {missing}"
