"""match_recognize operator semantics (operators/pattern.py): the
restricted MATCH_RECOGNIZE subset — first-symbol-wins classification,
leftmost-first non-overlapping greedy matching, per-match measures,
pattern validation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from okera_trino_spark.operators.pattern import match_recognize


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "seq", "ev", "v"]))


def test_greedy_non_overlapping_skip_past_last_row(spark):
    # A B B A B ... pattern AB+ must take A B B (greedy), skip past it,
    # then match A B — never re-enter consumed rows.
    rows = [("u", i, ev, float(i)) for i, ev in
            enumerate(["a", "b", "b", "a", "b", "x", "a"])]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("A", F.col("ev") == "a"), ("B", F.col("ev") == "b")],
        pattern="AB+",
    ).orderBy("match_num").collect()
    assert [(r.match_num, r.matched) for r in out] == [(1, "ABB"), (2, "AB")]


def test_first_symbol_wins_classification(spark):
    # Both predicates true for 'a' rows: lexical DEFINE order decides.
    rows = [("u", 0, "a", 1.0), ("u", 1, "b", 2.0)]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("X", F.col("v") > 0), ("A", F.col("ev") == "a")],
        pattern="XX",
    ).collect()
    assert [(r.match_num, r.matched) for r in out] == [(1, "XX")]


def test_measures_over_matched_slice(spark):
    rows = [("u", 0, "a", 10.0), ("u", 1, "b", 2.0), ("u", 2, "b", 3.0),
            ("u", 3, "x", 99.0)]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("A", F.col("ev") == "a"), ("B", F.col("ev") == "b")],
        pattern="AB+",
        measures={"total": lambda c, m: float(c["v"].sum()),
                  "n_b": lambda c, m: int(m.group(0).count("B"))},
        measure_schema="total double, n_b bigint",
    ).collect()
    assert len(out) == 1
    assert out[0].total == 15.0 and out[0].n_b == 2


def test_alternation_and_partition_isolation(spark):
    rows = [("u1", 0, "a", 1.0), ("u1", 1, "c", 1.0),
            ("u2", 0, "b", 1.0), ("u2", 1, "c", 1.0)]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("A", F.col("ev") == "a"), ("B", F.col("ev") == "b"),
                 ("C", F.col("ev") == "c")],
        pattern="(A|B)C",
    ).orderBy("k").collect()
    assert [(r.k, r.matched) for r in out] == [("u1", "AC"), ("u2", "BC")]


def test_pattern_validation_rejects_metachars(spark):
    df = _df(spark, [("u", 0, "a", 1.0)])
    with pytest.raises(ValueError, match="pattern"):
        match_recognize(df, ["k"], ["seq"],
                        symbols=[("A", F.col("ev") == "a")], pattern="A.B")
    with pytest.raises(ValueError, match="symbol"):
        match_recognize(df, ["k"], ["seq"],
                        symbols=[("ab", F.col("ev") == "a")], pattern="A")


def test_no_symbol_rows_break_matches(spark):
    # The filler classification char must be unmatchable: a-x-b is NOT
    # a contiguous AB.
    rows = [("u", 0, "a", 1.0), ("u", 1, "x", 1.0), ("u", 2, "b", 1.0)]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("A", F.col("ev") == "a"), ("B", F.col("ev") == "b")],
        pattern="AB",
    ).collect()
    assert out == []
