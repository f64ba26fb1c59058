"""The full TPC-H book as Trino-dialect TEXT vs the DataFrame twins.

Every query of the suite (Q1–Q22) must produce row-identical results
whether submitted as Trino SQL text (``execute_trino``) or built with
the DataFrame API (operators/analytics*.py, tpch_full.py, scan.py).
The twins are hash-green against DuckDB in the driver record, so text
== twin transitively holds the text forms to the same oracle; the
eight dialect-hardest texts are ALSO registered driver keys with the
twin's oracle (functions/trino_tpch.py) and swept directly by
tests/test_oracle_parity.py.

Comparison uses the driver-strict canonicalizer from tests/parity.py
(sorted columns, hash-sorted rows, f:-tagged %.9g floats), so a dtype
or value drift the driver would flag fails here first.
"""

from __future__ import annotations

import pytest

from okera_trino_spark.functions.trino_tpch import TRINO_TPCH, run_tpch_text
from okera_trino_spark.registry import load_all_queries

from tests.parity import _canon_frame

SF_SMALL = "/root/testdata/sf0.001"

#: text query number -> DataFrame twin key.
TWIN = {n: f"q_tpch_q{n}" for n in range(2, 23)}
TWIN[1] = "q_pricing_summary"


@pytest.mark.parametrize("n", sorted(TRINO_TPCH))
def test_text_matches_twin(spark, n):
    specs = load_all_queries()
    text_pdf = run_tpch_text(spark, n, SF_SMALL).toPandas()
    twin_pdf = specs[TWIN[n]].fn(spark, SF_SMALL).toPandas()
    assert sorted(text_pdf.columns) == sorted(twin_pdf.columns), (
        f"Q{n}: column drift {sorted(text_pdf.columns)} vs "
        f"{sorted(twin_pdf.columns)}")
    a, b = _canon_frame(text_pdf), _canon_frame(twin_pdf)
    assert a == b, (
        f"Q{n}: text/twin row drift — text {len(a)} rows, twin {len(b)}; "
        f"first diffs {[p for p in zip(a, b) if p[0] != p[1]][:3]}")


@pytest.mark.parametrize("n", [17, 19, 21])
def test_hard_shapes_match_twin_at_sf001(spark, n):
    """The three texts whose PLANS could silently degrade (Q17
    decorrelation, Q19 CNF extraction, Q21 semi/anti lowering) also
    twin-match at sf0.01, where the optimizer sees 10x the statistics
    and row counts — a plan regression that only manifests above toy
    scale would surface here."""
    specs = load_all_queries()
    sf = "/root/testdata/sf0.01"
    a = _canon_frame(run_tpch_text(spark, n, sf).toPandas())
    b = _canon_frame(specs[TWIN[n]].fn(spark, sf).toPandas())
    assert a == b, f"Q{n}: text/twin drift at sf0.01"


def test_q19_or_of_conjuncts_stays_hash_join(spark):
    """The spec's comma join + OR-of-conjuncts (each disjunct repeating
    p_partkey = l_partkey) must plan as an equi-join — Catalyst's CNF
    conversion extracts the common key. A cartesian/nested-loop plan
    here would be quadratic in lineitem x part at scale."""
    plan = (run_tpch_text(spark, 19, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan


def test_q17_correlated_subquery_decorrelates(spark):
    """The original Q17 correlated scalar-aggregate subquery must
    decorrelate into an aggregate + join (one pass over lineitem per
    side), never a per-row re-execution."""
    plan = (run_tpch_text(spark, 17, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    # the subquery side shows up as a partial_avg aggregate joined back
    assert "avg" in plan.lower()
    assert "HashJoin" in plan


def test_q21_exists_pair_plans_as_semi_and_anti(spark):
    """The double EXISTS / NOT EXISTS self-reference must lower to a
    left-semi and a left-anti join on l_orderkey (plus the inequality
    residuals) — the distributed shape that scales, and the one the
    reference's Trino engine itself picks."""
    plan = (run_tpch_text(spark, 21, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
