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


def test_match_recognize_sql_measures_vs_python_reference(spark, sf_dir):
    """The MATCH_RECOGNIZE SQL path's row-level MEASURES (sum/first/
    last) checked against an independent re.finditer walk over the
    collected fixture — no shared code with the operator."""
    import re as _re

    from okera_trino_spark.functions.trino_sql import execute_trino

    sql = """
    SELECT user_id, mn, n_rows, total, first_id, last_id
    FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts, event_id
        MEASURES match_number() AS mn, count(*) AS n_rows,
                 sum(value) AS total, first(event_id) AS first_id,
                 last(event_id) AS last_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (V C+ P)
        DEFINE V AS event_type = 'view',
               C AS event_type = 'click',
               P AS event_type = 'purchase'
    )
    """
    got = {(r.user_id, r.mn): (r.n_rows, round(r.total, 6), r.first_id, r.last_id)
           for r in execute_trino(spark, sql, sf_dir).collect()}

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("user_id", "ts", "event_id", "event_type", "value")
          .toPandas())
    sym = {"view": "V", "click": "C", "purchase": "P"}
    want = {}
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        s = "".join(sym.get(t, ".") for t in g["event_type"])
        for i, m in enumerate(_re.finditer("VC+P", s), start=1):
            chunk = g.iloc[m.start():m.end()]
            want[(uid, i)] = (len(chunk), round(float(chunk["value"].sum()), 6),
                              int(chunk["event_id"].iloc[0]),
                              int(chunk["event_id"].iloc[-1]))
    assert got == want and len(got) > 0


def test_match_recognize_sql_named_errors(spark):
    from okera_trino_spark.functions.trino_sql import (
        TrinoSqlUnsupported, execute_match_recognize)

    base = """SELECT * FROM events MATCH_RECOGNIZE (
        {body}
        PATTERN (A B) DEFINE A AS value > 0, B AS value < 0)"""
    for body, msg in [
        ("ORDER BY ts", "PARTITION BY"),
        # Display modifiers, SUBSET and ORDER BY DESC are supported
        # (r8); a MEASURES item without an alias stays refused.
        ("PARTITION BY user_id ORDER BY ts MEASURES count(*)",
         "AS alias"),
        # SUBSET components must be defined pattern variables.
        ("PARTITION BY user_id ORDER BY ts SUBSET U = (A, Z)",
         "undefined"),
        # SKIP TO FIRST/LAST var (r8) and SUBSET targets (late r8) are
        # supported; an undefined skip target is the named error now.
        ("PARTITION BY user_id ORDER BY ts AFTER MATCH SKIP TO FIRST Z",
         "neither a DEFINEd pattern variable nor a SUBSET"),
    ]:
        with pytest.raises(TrinoSqlUnsupported, match=msg):
            execute_match_recognize(spark, base.format(body=body))
    # undefined pattern variable (always-true) refused
    with pytest.raises(TrinoSqlUnsupported, match="no DEFINE"):
        execute_match_recognize(spark, """SELECT * FROM events
            MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
            PATTERN (A B) DEFINE A AS value > 0)""")
    # r7: PREV/NEXT are supported; what stays refused is navigation the
    # subset cannot express faithfully.
    with pytest.raises(TrinoSqlUnsupported, match="nested"):
        execute_match_recognize(spark, """SELECT * FROM events
            MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
            PATTERN (A B) DEFINE A AS value > PREV(PREV(value)),
            B AS value < 0)""")
    with pytest.raises(TrinoSqlUnsupported, match="offset"):
        execute_match_recognize(spark, """SELECT * FROM events
            MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
            PATTERN (A B) DEFINE A AS value > PREV(value, ts),
            B AS value < 0)""")
    # references qualified by OTHER pattern variables refused
    with pytest.raises(TrinoSqlUnsupported, match="OTHER pattern"):
        execute_match_recognize(spark, """SELECT * FROM events
            MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
            PATTERN (A B) DEFINE A AS value > B.value,
            B AS value < 0)""")
    # ALL ROWS PER MATCH aggregates are supported over bare columns
    # (r8, RUNNING/FINAL); a composite expression stays refused.
    with pytest.raises(TrinoSqlUnsupported, match="ALL ROWS PER MATCH"):
        execute_match_recognize(spark, """SELECT * FROM events
            MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
            MEASURES sum(value + 1) AS s ALL ROWS PER MATCH
            PATTERN (A B) DEFINE A AS value > 0, B AS value < 0)""")
    # no MATCH_RECOGNIZE block → None (caller falls through)
    assert execute_match_recognize(spark, "SELECT 1") is None


def test_match_recognize_governed_path(spark, sf_dir):
    """Dialect MATCH_RECOGNIZE through GovernedCatalog.execute: the
    pattern scan reads GOVERNED views (row policy applies) and the
    original text is audited."""
    from okera_trino_spark.sources.catalog import GovernedCatalog, TablePolicy

    sql = """SELECT user_id, mn FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts, event_id
        MEASURES match_number() AS mn
        PATTERN (V P) DEFINE V AS event_type = 'view',
        P AS event_type = 'purchase')"""
    cat = GovernedCatalog(spark, sf_dir)
    full = cat.execute(sql, user="root", dialect="trino").count()
    cat.set_policy("analyst", "events", TablePolicy(row_filter="user_id < 5"))
    seen = cat.execute(sql, user="analyst", dialect="trino")
    users = {r.user_id for r in seen.collect()}
    assert users and all(u < 5 for u in users)
    assert cat.audit_log[-1].sql == sql
    assert full > len(users)


def test_match_recognize_sql_lowercase(spark, sf_dir):
    """Dialect text is case-insensitive — a lowercase MATCH_RECOGNIZE
    block must parse identically (the section splitter was the one
    case-sensitive spot)."""
    from okera_trino_spark.functions.trino_sql import execute_trino

    sql = """select user_id, mn from events match_recognize (
        partition by user_id order by ts, event_id
        measures match_number() as mn
        pattern (V P) define V as event_type = 'view',
        P as event_type = 'purchase')"""
    assert execute_trino(spark, sql, sf_dir).count() > 0


def test_null_partition_key_group_straddles_arrow_batch(spark):
    """r7 regression (ADVICE/VERDICT r6): a NULL partition key group
    split across Arrow batches must be reassembled — pandas NaN == NaN
    is False, so the pre-fix carry-over comparison emitted the group
    twice as separate fragments (wrong match_num, extra matches)."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        # One NULL-key group of 7 rows: A B B | A B | x A across 2-row
        # batches. Correct output: matches ABB then AB within ONE group.
        rows = [(None, i, ev, float(i)) for i, ev in
                enumerate(["a", "b", "b", "a", "b", "x", "a"])]
        df = spark.createDataFrame(
            rows, schema="k string, seq long, ev string, v double")
        out = match_recognize(
            df, ["k"], ["seq"],
            symbols=[("A", F.col("ev") == "a"), ("B", F.col("ev") == "b")],
            pattern="AB+",
        ).orderBy("match_num").collect()
        assert [(r.match_num, r.matched) for r in out] == [
            (1, "ABB"), (2, "AB")]
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_prev_next_lowering_vs_python_reference(spark, sf_dir):
    """r7 PREV/NEXT lowering proven against a standalone Python walk:
    classify each physical row by comparing with its lag/lead neighbor,
    then regex-match — exactly what the lowering must reproduce."""
    import re as _re

    from okera_trino_spark.functions.trino_sql import execute_trino

    sql = """SELECT user_id, match_num, n_rows
    FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts, event_id
      MEASURES match_number() AS match_num, count(*) AS n_rows
      PATTERN (D+ U+)
      DEFINE D AS value < PREV(value),
             U AS NEXT(value, 2) IS NOT NULL AND value > PREV(value))"""
    got = sorted(
        (r.user_id, r.match_num, r.n_rows)
        for r in execute_trino(spark, sql, sf_dir).collect())

    rows = (spark.table("events")
            .select("user_id", "ts", "event_id", "value").collect())
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.value)
    want = []
    for uid, vals in by_user.items():
        s = ""
        for i, v in enumerate(vals):
            pv = vals[i - 1] if i >= 1 else None
            nx2 = vals[i + 2] if i + 2 < len(vals) else None
            if pv is not None and v < pv:
                s += "A"
            elif nx2 is not None and pv is not None and v > pv:
                s += "B"
            else:
                s += "."
        for k, m in enumerate(_re.finditer("A+B+", s), start=1):
            want.append((uid, k, len(m.group(0))))
    assert got == sorted(want)


def test_all_rows_sql_path_consistent_with_one_row(spark, sf_dir):
    """ALL ROWS PER MATCH through the string path: per-row output
    grouped back to one row per match must equal the ONE ROW PER MATCH
    output of the same pattern, and classifier() returns DEFINE
    variable NAMES (not internal letters)."""
    from okera_trino_spark.functions.trino_sql import execute_trino

    body = """PARTITION BY user_id ORDER BY ts, event_id
      {measures}
      PATTERN (V C+ P)
      DEFINE V AS event_type = 'view', C AS event_type = 'click',
             P AS event_type = 'purchase'"""
    all_rows = execute_trino(
        spark, "SELECT user_id, mn, cls FROM events MATCH_RECOGNIZE ("
        + body.format(
            measures="MEASURES match_number() AS mn, classifier() AS cls "
                     "ALL ROWS PER MATCH") + ")", sf_dir)
    one_row = execute_trino(
        spark, "SELECT user_id, mn, n FROM events MATCH_RECOGNIZE ("
        + body.format(
            measures="MEASURES match_number() AS mn, count(*) AS n "
                     "ONE ROW PER MATCH") + ")", sf_dir)
    got = sorted((r.user_id, r.mn, r["count(1)"] if "count(1)" in r else r.n)
                 for r in (all_rows.groupBy("user_id", "mn").count()
                           .withColumnRenamed("count", "n").collect()))
    want = sorted((r.user_id, r.mn, r.n) for r in one_row.collect())
    assert got == want
    classifiers = {r.cls for r in all_rows.collect()}
    assert classifiers == {"V", "C", "P"}


def test_skip_to_next_row_overlapping(spark):
    """AFTER MATCH SKIP TO NEXT ROW (r8): D D U U yields matches
    anchored at BOTH falling rows — overlap the PAST LAST ROW mode
    cannot produce — with sequential match numbering."""
    rows = [("u", i, ev, float(i)) for i, ev in
            enumerate(["d", "d", "u", "u", "x", "d", "u"])]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("D", F.col("ev") == "d"), ("U", F.col("ev") == "u")],
        pattern="D+U+",
        after_match="next_row",
    ).orderBy("match_num").collect()
    assert [(r.match_num, r.matched) for r in out] == [
        (1, "DDUU"), (2, "DUU"), (3, "DU")]
    # same input, default mode: non-overlapping
    out2 = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("D", F.col("ev") == "d"), ("U", F.col("ev") == "u")],
        pattern="D+U+",
    ).orderBy("match_num").collect()
    assert [(r.match_num, r.matched) for r in out2] == [
        (1, "DDUU"), (2, "DU")]


def test_all_rows_running_measures_operator(spark):
    """ALL ROWS PER MATCH measure callables (r8): a vector return maps
    per-row (RUNNING), a scalar broadcasts to the match (FINAL)."""
    rows = [("u", 0, "a", 10.0), ("u", 1, "b", 2.0), ("u", 2, "b", 3.0)]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("A", F.col("ev") == "a"), ("B", F.col("ev") == "b")],
        pattern="AB+",
        measures={
            "run_sum": lambda c, m: [float(x) for x in c["v"].cumsum()],
            "final_n": lambda c, m: len(c),
        },
        measure_schema="run_sum double, final_n bigint",
        all_rows=True,
    ).orderBy("seq").collect()
    assert [(r.classifier, r.run_sum, r.final_n) for r in out] == [
        ("A", 10.0, 3), ("B", 12.0, 3), ("B", 15.0, 3)]


def test_sql_path_running_final_measures(spark, sf_dir):
    """String-path RUNNING vs FINAL (r8): RUNNING sum climbs to the
    match total; FINAL sum shows the total on every row; RUNNING last
    is the current row's value."""
    from okera_trino_spark.functions.trino_sql import execute_trino

    sql = """SELECT user_id, mn, rsum, fsum, rlast, value
    FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts, event_id
      MEASURES match_number() AS mn, RUNNING sum(value) AS rsum,
               FINAL sum(value) AS fsum, RUNNING last(value) AS rlast
      ALL ROWS PER MATCH
      PATTERN (V C+ P)
      DEFINE V AS event_type = 'view', C AS event_type = 'click',
             P AS event_type = 'purchase')"""
    rows = execute_trino(spark, sql, sf_dir).collect()
    assert rows
    import collections
    groups = collections.defaultdict(list)
    for r in rows:
        groups[(r.user_id, r.mn)].append(r)
    for g in groups.values():
        total = g[-1].fsum
        run = 0.0
        for r in g:
            run += r.value
            assert abs(r.rsum - run) < 1e-6
            assert abs(r.fsum - total) < 1e-9
            assert r.rlast == r.value
        assert abs(g[-1].rsum - total) < 1e-6


def test_sql_path_skip_to_next_row(spark, sf_dir):
    """String-path SKIP TO NEXT ROW (r8) against the Python overlap
    replay: anchored matches at every start position."""
    import re as _re

    from okera_trino_spark.functions.trino_sql import execute_trino

    sql = """SELECT user_id, match_num, n_rows
    FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts, event_id
      MEASURES match_number() AS match_num, count(*) AS n_rows
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (D+ U+)
      DEFINE D AS value < PREV(value), U AS value > PREV(value))"""
    got = sorted(
        (r.user_id, r.match_num, r.n_rows)
        for r in execute_trino(spark, sql, sf_dir).collect())

    rows = (spark.table("events")
            .select("user_id", "ts", "event_id", "value").collect())
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.value)
    want = []
    pat = _re.compile("D+U+")
    for uid, vals in by_user.items():
        s = ""
        for i, v in enumerate(vals):
            pv = vals[i - 1] if i >= 1 else None
            s += ("D" if pv is not None and v < pv
                  else "U" if pv is not None and v > pv else ".")
        pos, k = 0, 0
        while True:
            m = pat.search(s, pos)
            if m is None:
                break
            k += 1
            want.append((uid, k, len(m.group(0))))
            pos = m.start() + 1
    assert got == sorted(want)


def test_nav_other_variable_reference_refused(spark, sf_dir):
    """r8 (ADVICE): PREV(B.value) inside DEFINE A must raise the named
    error, not leak a raw qualified reference into F.expr."""
    from okera_trino_spark.functions.trino_sql import (
        TrinoSqlUnsupported, execute_trino)

    sql = """SELECT user_id FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts, event_id
      PATTERN (A+ B+)
      DEFINE A AS value > PREV(B.value), B AS value > 0)"""
    with pytest.raises(TrinoSqlUnsupported, match="PREV/NEXT argument"):
        execute_trino(spark, sql, sf_dir)


def test_unknown_after_match_refused(spark, sf_dir):
    # SKIP TO FIRST/LAST var landed in r8; malformed skip text is the
    # remaining named error.
    from okera_trino_spark.functions.trino_sql import (
        TrinoSqlUnsupported, execute_trino)

    sql = """SELECT user_id FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts, event_id
      AFTER MATCH SKIP HALFWAY THROUGH
      PATTERN (A+) DEFINE A AS value > 0)"""
    with pytest.raises(TrinoSqlUnsupported, match="AFTER MATCH"):
        execute_trino(spark, sql, sf_dir)


def test_skip_to_last_var_operator(spark):
    """SKIP TO LAST U (r8): the scan resumes AT the last U row of each
    match, so that row seeds the next (overlapping) match."""
    rows = [("u", i, ev, float(i)) for i, ev in
            enumerate(["d", "u", "d", "u", "d"])]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("D", F.col("ev") == "d"), ("U", F.col("ev") == "u")],
        pattern="D+U+D",
        after_match="last:U",
    ).orderBy("match_num").collect()
    # match 1 = rows 0-2 "DUD"; resume AT row 1's U? no — last U of the
    # match is row 1, so the search restarts there and finds rows 2-4
    # "DUD": row 2 is REUSED across matches (impossible under PAST
    # LAST ROW).
    assert [(r.match_num, r.matched) for r in out] == [
        (1, "DUD"), (2, "DUD")]


def test_skip_to_first_var_operator(spark):
    """SKIP TO FIRST U (r8): resume at the first U row of each match —
    the U run can seed a later pattern occurrence."""
    rows = [("u", i, ev, float(i)) for i, ev in
            enumerate(["d", "u", "d", "u", "u", "x"])]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("D", F.col("ev") == "d"), ("U", F.col("ev") == "u")],
        pattern="DU+",
        after_match="first:U",
    ).orderBy("match_num").collect()
    # match 1 = DU (rows 0-1), resume at row 1 (first U); no D at row
    # 1, next match = DUU (rows 2-4), resume at row 3; done.
    assert [(r.match_num, r.matched) for r in out] == [
        (1, "DU"), (2, "DUU")]


def test_skip_to_var_runtime_errors(spark):
    rows = [("u", i, ev, float(i)) for i, ev in
            enumerate(["d", "u", "d", "u"])]
    # last D of DU is the match's first row: Trino's infinite-loop error
    df = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("D", F.col("ev") == "d"), ("U", F.col("ev") == "u")],
        pattern="DU",
        after_match="last:D",
    )
    with pytest.raises(Exception, match="first row of the match"):
        df.collect()
    # skip symbol absent from the match: named runtime error
    df2 = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("D", F.col("ev") == "d"), ("U", F.col("ev") == "u"),
                 ("X", F.col("ev") == "z")],
        pattern="DU",
        after_match="last:X",
    )
    with pytest.raises(Exception, match="contains no"):
        df2.collect()


def test_reluctant_quantifier(spark):
    """Reluctant ``A B+? C`` takes the SHORTEST B run that still lets
    the match complete — Python regex implements Trino's preference
    exactly."""
    rows = [("u", i, ev, float(i)) for i, ev in
            enumerate(["a", "b", "b", "c", "c"])]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("A", F.col("ev") == "a"), ("B", F.col("ev") == "b"),
                 ("C", F.col("ev") == "c")],
        pattern="AB+?C",   # greedy would also stop at first C here;
    ).collect()            # reluctant semantics shown via B{1,2}? below
    assert [(r.match_num, r.matched) for r in out] == [(1, "ABBC")]
    rows2 = [("u", i, ev, float(i)) for i, ev in
             enumerate(["b", "b", "b"])]
    out2 = match_recognize(
        _df(spark, rows2), ["k"], ["seq"],
        symbols=[("B", F.col("ev") == "b")],
        pattern="B{1,3}?",
    ).orderBy("match_num").collect()
    # reluctant {1,3}? prefers length 1: three separate matches
    assert [(r.match_num, r.matched) for r in out2] == [
        (1, "B"), (2, "B"), (3, "B")]


def test_permute_string_path(spark, sf_dir):
    """PERMUTE(V, C) expands to (V C | C V) with leftmost preference;
    verified against the explicit alternation."""
    from okera_trino_spark.functions.trino_sql import execute_trino

    body = """PARTITION BY user_id ORDER BY ts, event_id
      MEASURES match_number() AS mn, classifier() AS cls
      PATTERN ({pat})
      DEFINE V AS event_type = 'view', C AS event_type = 'click'"""
    a = execute_trino(
        spark, "SELECT user_id, mn, cls FROM events MATCH_RECOGNIZE ("
        + body.format(pat="PERMUTE(V, C)") + ")", sf_dir).collect()
    b = execute_trino(
        spark, "SELECT user_id, mn, cls FROM events MATCH_RECOGNIZE ("
        + body.format(pat="(V C | C V)") + ")", sf_dir).collect()
    key = lambda r: (r.user_id, r.mn, r.cls)
    assert sorted(a, key=key) == sorted(b, key=key) and len(a) > 0


def test_skip_to_last_string_path(spark, sf_dir):
    """SKIP TO LAST U through the SQL path vs a Python replay."""
    import re as _re

    from okera_trino_spark.functions.trino_sql import execute_trino

    sql = """SELECT user_id, match_num, n_rows
    FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts, event_id
      MEASURES match_number() AS match_num, count(*) AS n_rows
      AFTER MATCH SKIP TO LAST U
      PATTERN (D+ U+ D)
      DEFINE D AS value < PREV(value), U AS value > PREV(value))"""
    got = sorted(
        (r.user_id, r.match_num, r.n_rows)
        for r in execute_trino(spark, sql, sf_dir).collect())

    rows = (spark.table("events")
            .select("user_id", "ts", "event_id", "value").collect())
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.value)
    pat = _re.compile("D+U+D")
    want = []
    for uid, vals in by_user.items():
        s = ""
        for i, v in enumerate(vals):
            pv = vals[i - 1] if i >= 1 else None
            s += ("D" if pv is not None and v < pv
                  else "U" if pv is not None and v > pv else ".")
        pos, k = 0, 0
        while True:
            m = pat.search(s, pos)
            if m is None:
                break
            k += 1
            want.append((uid, k, len(m.group(0))))
            pos = m.start() + m.group(0).rfind("U")
        # rfind('U') index > 0 always (pattern needs leading D)
    assert got == sorted(want)


def test_with_unmatched_rows_operator(spark):
    """WITH UNMATCHED ROWS (r8): unmatched rows surface with NULL
    match_num/classifier/measures; matched rows unchanged; nothing
    dropped or duplicated."""
    rows = [("u", i, ev, float(i)) for i, ev in
            enumerate(["x", "a", "b", "y", "a", "b"])]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("A", F.col("ev") == "a"), ("B", F.col("ev") == "b")],
        pattern="AB",
        measures={"rsum": lambda c, m: [float(x) for x in c["v"].cumsum()]},
        measure_schema="rsum double",
        all_rows=True,
        with_unmatched=True,
    ).orderBy("seq").collect()
    assert len(out) == 6
    got = [(r.seq, r.match_num, r.classifier, r.rsum) for r in out]
    assert got == [
        (0, None, None, None),
        (1, 1, "A", 1.0), (2, 1, "B", 3.0),
        (3, None, None, None),
        (4, 2, "A", 4.0), (5, 2, "B", 9.0)]
    # invalid combinations refuse
    with pytest.raises(ValueError, match="with_unmatched"):
        match_recognize(
            _df(spark, rows), ["k"], ["seq"],
            symbols=[("A", F.col("ev") == "a")], pattern="A",
            with_unmatched=True)
    with pytest.raises(ValueError, match="with_unmatched"):
        match_recognize(
            _df(spark, rows), ["k"], ["seq"],
            symbols=[("A", F.col("ev") == "a")], pattern="A",
            all_rows=True, after_match="next_row", with_unmatched=True)


def test_show_empty_matches_operator(spark):
    """show_empty (r8): an empty-matchable pattern A* numbers every
    scan position — maximal A-runs as real matches, every other row as
    an EMPTY match (row shown, NULL classifier, zero-length measure
    vector becomes NULL). OMIT drops the empty rows but keeps the
    numbering gaps; ONE ROW PER MATCH always includes empty matches."""
    rows = [("u", i, ev, float(i)) for i, ev in
            enumerate(["a", "x", "a", "a", "y"])]
    kw = dict(
        symbols=[("A", F.col("ev") == "a")], pattern="A*",
        measures={"rsum": lambda c, m: [float(x) for x in c["v"].cumsum()]},
        measure_schema="rsum double")
    show = match_recognize(
        _df(spark, rows), ["k"], ["seq"], all_rows=True, show_empty=True,
        **kw).orderBy("seq").collect()
    assert [(r.seq, r.match_num, r.classifier, r.rsum) for r in show] == [
        (0, 1, "A", 0.0),
        (1, 2, None, None),
        (2, 3, "A", 2.0), (3, 3, "A", 5.0),
        (4, 4, None, None)]
    omit = match_recognize(
        _df(spark, rows), ["k"], ["seq"], all_rows=True,
        **kw).orderBy("seq").collect()
    assert [(r.seq, r.match_num) for r in omit] == [(0, 1), (2, 3), (3, 3)]
    # WITH UNMATCHED ROWS implies showing empty matches; under A*
    # every row hosts a match or an empty match, so nothing is NULL.
    unm = match_recognize(
        _df(spark, rows), ["k"], ["seq"], all_rows=True,
        with_unmatched=True, **kw).orderBy("seq").collect()
    assert ([(r.seq, r.match_num, r.classifier, r.rsum) for r in unm]
            == [(r.seq, r.match_num, r.classifier, r.rsum) for r in show])
    one = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("A", F.col("ev") == "a")], pattern="A*",
        measures={"n": lambda c, m: len(c)}, measure_schema="n bigint",
    ).orderBy("match_num").collect()
    assert [(r.match_num, r.matched, r.n) for r in one] == [
        (1, "A", 1), (2, "", 0), (3, "AA", 2), (4, "", 0)]
    with pytest.raises(ValueError, match="show_empty"):
        match_recognize(_df(spark, rows), ["k"], ["seq"],
                        symbols=[("A", F.col("ev") == "a")], pattern="A*",
                        show_empty=True)


def test_pattern_anchors(spark):
    """r8: ^/$ partition anchors — the per-partition symbol string IS
    the row sequence, so ^A matches only a partition-leading A and A$
    only a partition-trailing one; exclusions stay a named error."""
    from okera_trino_spark.functions.trino_sql import (
        TrinoSqlUnsupported, execute_trino)

    rows = [("u", i, ev, 0.0) for i, ev in
            enumerate(["a", "b", "a", "b", "a"])]
    _df(spark, rows).createOrReplaceTempView("mra")
    head = execute_trino(spark, """
      SELECT seq, mn FROM mra MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seq
        MEASURES match_number() AS mn
        ALL ROWS PER MATCH
        PATTERN (^ A B)
        DEFINE A AS ev = 'a', B AS ev = 'b')
    """).collect()
    assert sorted((r.seq, r.mn) for r in head) == [(0, 1), (1, 1)]
    tail = execute_trino(spark, """
      SELECT seq, mn FROM mra MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seq
        MEASURES match_number() AS mn
        ALL ROWS PER MATCH
        PATTERN (B A $)
        DEFINE A AS ev = 'a', B AS ev = 'b')
    """).collect()
    assert sorted((r.seq, r.mn) for r in tail) == [(3, 1), (4, 1)]


def test_pattern_exclusions(spark):
    """r8: {- X -} output exclusions — excluded rows stay part of the
    match (numbering, RUNNING measures, skip positions) but are
    dropped from ALL-ROWS output; quantified/nested exclusions raise."""
    from okera_trino_spark.functions.trino_sql import execute_trino

    rows = [("u", i, ev, float(i + 1)) for i, ev in
            enumerate(["a", "b", "b", "c", "a", "b", "c"])]
    _df(spark, rows).createOrReplaceTempView("mre")
    out = execute_trino(spark, """
      SELECT seq, mn, cls, rs
      FROM mre MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seq
        MEASURES match_number() AS mn, classifier() AS cls,
                 RUNNING sum(v) AS rs
        ALL ROWS PER MATCH
        PATTERN (A {- B+ -} C)
        DEFINE A AS ev = 'a', B AS ev = 'b', C AS ev = 'c')
    """).orderBy("seq").collect()
    # B rows (seq 1, 2, 5) are matched but not emitted; the C row's
    # RUNNING sum still includes them (1+2+3+4 = 10; 5+6+7 = 18).
    assert [(r.seq, r.mn, r.cls, r.rs) for r in out] == [
        (0, 1, "A", 1.0), (3, 1, "C", 10.0),
        (4, 2, "A", 5.0), (6, 2, "C", 18.0)]
    # ONE ROW PER MATCH: exclusions are irrelevant (Trino) — the
    # summary row still aggregates every matched row.
    one = execute_trino(spark, """
      SELECT mn, n FROM mre MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seq
        MEASURES match_number() AS mn, count(*) AS n
        PATTERN (A {- B+ -} C)
        DEFINE A AS ev = 'a', B AS ev = 'b', C AS ev = 'c')
    """).orderBy("mn").collect()
    assert [(r.mn, r.n) for r in one] == [(1, 4), (2, 3)]
    # r9: QUANTIFIED exclusions — every repetition's span is dropped
    # (the regex module reports all group-repetition spans; stdlib re
    # kept only the last, which is why these used to refuse).
    quant = execute_trino(spark, """
      SELECT seq, mn, cls FROM mre MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seq
        MEASURES match_number() AS mn, classifier() AS cls
        ALL ROWS PER MATCH
        PATTERN (A {- B -}+ C)
        DEFINE A AS ev = 'a', B AS ev = 'b', C AS ev = 'c')
    """).orderBy("seq").collect()
    assert [(r.seq, r.mn, r.cls) for r in quant] == [
        (0, 1, "A"), (3, 1, "C"), (4, 2, "A"), (6, 2, "C")]
    # Exclusion inside a quantified GROUP: each repetition's B-span is
    # excluded, the C of every repetition is kept.
    grouped = execute_trino(spark, """
      SELECT seq, mn, cls FROM mre MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seq
        MEASURES match_number() AS mn, classifier() AS cls
        ALL ROWS PER MATCH
        PATTERN (({- B+ -} C)+)
        DEFINE B AS ev = 'b', C AS ev = 'c')
    """).orderBy("seq").collect()
    assert [(r.seq, r.mn, r.cls) for r in grouped] == [
        (3, 1, "C"), (6, 2, "C")]
    # nested exclusions stay refused (Trino rejects them too)
    with pytest.raises(ValueError, match="nested"):
        execute_trino(spark, """
          SELECT * FROM mre MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY seq
            PATTERN (A {- B {- C -} -})
            DEFINE A AS ev = 'a', B AS ev = 'b', C AS ev = 'c')
        """)


def test_order_by_desc(spark):
    """r8: ORDER BY … DESC walks the pattern in descending order —
    equivalent to matching the reversed pattern ascending."""
    from okera_trino_spark.functions.trino_sql import execute_trino

    _df(spark, [("u", i, ev, float(i)) for i, ev in
                enumerate(["b", "a", "x", "b", "b", "a"])]
        ).createOrReplaceTempView("mrd")
    out = execute_trino(spark, """
      SELECT seq, mn, cls
      FROM mrd MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seq DESC
        MEASURES match_number() AS mn, classifier() AS cls
        ALL ROWS PER MATCH
        PATTERN (A B+)
        DEFINE A AS ev = 'a', B AS ev = 'b')
    """).collect()
    # Descending row order: seq 5(a) 4(b) 3(b) 2(x) 1(a) 0(b) — two
    # matches: [5,4,3] then [1,0].
    got = sorted((r.seq, r.mn, r.cls) for r in out)
    assert got == [(0, 2, "B"), (1, 2, "A"),
                   (3, 1, "B"), (4, 1, "B"), (5, 1, "A")]


def test_qualified_measures_and_subset(spark):
    """r8: variable-qualified MEASURES aggregate only the rows the
    match classified to that variable (or SUBSET union) — RUNNING
    forms are NULL (sum/min) or 0 (count) before the first qualifying
    row; FINAL forms broadcast the whole-match value."""
    from okera_trino_spark.functions.trino_sql import execute_trino

    _df(spark, [("u", i, ev, float(i + 1)) for i, ev in
                enumerate(["a", "b", "b", "x", "a", "b"])]
        ).createOrReplaceTempView("mrq")
    out = execute_trino(spark, """
      SELECT seq, mn, cls, rb, rsb, fsb, av, rmin
      FROM mrq MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seq
        MEASURES match_number() AS mn, classifier() AS cls,
                 RUNNING count(B.*) AS rb, RUNNING sum(B.v) AS rsb,
                 FINAL sum(B.v) AS fsb, first(A.v) AS av,
                 RUNNING min(B.v) AS rmin
        ALL ROWS PER MATCH
        PATTERN (A B+)
        DEFINE A AS ev = 'a', B AS ev = 'b')
    """).orderBy("seq").collect()
    got = [(r.seq, r.mn, r.cls, r.rb, r.rsb, r.fsb, r.av, r.rmin)
           for r in out]
    assert got == [
        (0, 1, "A", 0, None, 5.0, 1.0, None),
        (1, 1, "B", 1, 2.0, 5.0, 1.0, 2.0),
        (2, 1, "B", 2, 5.0, 5.0, 1.0, 2.0),
        (4, 2, "A", 0, None, 6.0, 5.0, None),
        (5, 2, "B", 1, 6.0, 6.0, 5.0, 6.0)]
    one = execute_trino(spark, """
      SELECT mn, nb, ws
      FROM mrq MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seq
        MEASURES match_number() AS mn, count(B.*) AS nb, sum(W.v) AS ws
        SUBSET W = (A, B)
        PATTERN (A B+)
        DEFINE A AS ev = 'a', B AS ev = 'b')
    """).orderBy("mn").collect()
    assert [(r.mn, r.nb, r.ws) for r in one] == [(1, 2, 6.0), (2, 1, 11.0)]


def test_omit_empty_matches_is_noop(spark, sf_dir):
    """r8: for a pattern that cannot match empty, all three ALL-ROWS
    display modifiers (bare/SHOW/OMIT) produce identical output."""
    from okera_trino_spark.functions.trino_sql import execute_trino

    body = """PARTITION BY user_id ORDER BY ts, event_id
      MEASURES match_number() AS mn
      ALL ROWS PER MATCH {mod}
      PATTERN (V C+ P)
      DEFINE V AS event_type = 'view', C AS event_type = 'click',
             P AS event_type = 'purchase'"""
    base = "SELECT user_id, mn FROM events MATCH_RECOGNIZE ({b})"
    key = lambda r: (r.user_id, r.mn)
    a = sorted(execute_trino(spark, base.format(b=body.format(mod="")),
                             sf_dir).collect(), key=key)
    for mod in ("OMIT EMPTY MATCHES", "SHOW EMPTY MATCHES"):
        b = sorted(execute_trino(
            spark, base.format(b=body.format(mod=mod)), sf_dir).collect(),
            key=key)
        assert a == b and len(a) > 0


def test_show_empty_matches_string_path(spark, sf_dir):
    """r8: SHOW EMPTY MATCHES (Trino's ALL-ROWS default) on the
    empty-matchable pattern C*: every input row appears exactly once —
    click runs as real matches, every other row as an EMPTY match with
    its own sequential number, NULL classifier, RUNNING count 0; OMIT
    drops exactly the empty rows but keeps their numbers (gaps)."""
    from okera_trino_spark.functions.trino_sql import execute_trino

    body = """PARTITION BY user_id ORDER BY ts, event_id
      MEASURES match_number() AS mn, classifier() AS cls,
               RUNNING count(*) AS n
      ALL ROWS PER MATCH {mod}
      PATTERN (C*)
      DEFINE C AS event_type = 'click'"""
    base = ("SELECT user_id, event_id, mn, cls, n FROM events "
            "MATCH_RECOGNIZE ({b})")
    key = lambda r: (r.user_id, r.event_id)
    show = sorted(execute_trino(
        spark, base.format(b=body.format(mod="SHOW EMPTY MATCHES")),
        sf_dir).collect(), key=key)
    bare = sorted(execute_trino(
        spark, base.format(b=body.format(mod="")), sf_dir).collect(),
        key=key)
    omit = sorted(execute_trino(
        spark, base.format(b=body.format(mod="OMIT EMPTY MATCHES")),
        sf_dir).collect(), key=key)
    n_events = spark.table("events").count()
    assert bare == show                      # SHOW is the default
    assert len(show) == n_events             # every row exactly once
    empty = [r for r in show if r.cls is None]
    assert empty and all(r.n == 0 and r.mn is not None for r in empty)
    assert [r for r in show if r.cls == "C"] == omit  # OMIT = real rows
    assert any(r.n >= 2 for r in omit)       # a multi-click run exists
    # empty matches consume numbers: within one user, OMIT numbering
    # has gaps exactly where SHOW has empty-match rows.
    mns = {}
    for r in show:
        mns.setdefault(r.user_id, set()).add(r.mn)
    assert all(max(v) == len(v) for v in mns.values())  # 1..k per user


def test_skip_to_subset_operator(spark):
    """SKIP TO LAST of a SUBSET (multi-letter skip symbol): the target
    is the last row mapped to ANY member variable."""
    rows = [("u", i, ev, float(i)) for i, ev in
            enumerate(["d", "u", "d", "u", "d"])]
    out = match_recognize(
        _df(spark, rows), ["k"], ["seq"],
        symbols=[("D", F.col("ev") == "d"), ("U", F.col("ev") == "u")],
        pattern="D+U+D",
        after_match="last:UD",   # SUBSET W = (U, D) → member set
    ).orderBy("match_num").collect()
    # match 1 = rows 0-2 "DUD": last row in {U, D} is the final D
    # (index 2) — the scan resumes AT it, which seeds match 2 rows 2-4.
    assert [(r.match_num, r.matched) for r in out] == [
        (1, "DUD"), (2, "DUD")]


def test_lazy_rows_proxy_contract():
    """_LazyRows (r15): len() answers from span arithmetic WITHOUT
    materializing the pandas slice (the measured 78%-of-walk cost on
    q_trino_sql_mr_prev), while any genuine item/attribute access
    materializes exactly g.iloc[a:b]."""
    import pandas as pd

    from okera_trino_spark.operators.pattern import _LazyRows

    g = pd.DataFrame({"v": [10, 20, 30, 40], "w": list("abcd")})
    lr = _LazyRows(g, 1, 3)
    assert len(lr) == 2
    assert lr._df is None            # len() must not materialize
    assert list(lr["v"]) == [20, 30]
    assert lr._df is not None        # item access materializes once
    assert lr.iloc[0]["w"] == "b"    # attr access forwards to the slice
    pd.testing.assert_frame_equal(lr._materialize(), g.iloc[1:3])
    empty = _LazyRows(g, 2, 2)
    assert len(empty) == 0 and empty._df is None


def test_group_bounds_matches_groupby_blocks():
    """_group_bounds (r15): the offset-based group iteration that
    replaced per-group ``pdf.groupby`` frames in the emit walk must
    reproduce groupby's blocks exactly on key-sorted input — including
    NULL keys (NaN == NaN, groupby(dropna=False) semantics),
    multi-column keys, a single-row frame, and a single-group frame."""
    import numpy as np
    import pandas as pd

    from okera_trino_spark.operators.pattern import _group_bounds

    cases = [
        (pd.DataFrame({"k": [1, 1, 2, 2, 2, 3], "v": range(6)}), ["k"]),
        (pd.DataFrame({"k": [np.nan, np.nan, 1.0, 2.0], "v": range(4)}),
         ["k"]),
        (pd.DataFrame({"a": [1, 1, 1, 2], "b": ["x", "x", "y", "y"],
                       "v": range(4)}), ["a", "b"]),
        (pd.DataFrame({"k": [7], "v": [0]}), ["k"]),
        (pd.DataFrame({"k": ["s"] * 5, "v": range(5)}), ["k"]),
    ]
    for pdf, keys in cases:
        bounds = _group_bounds(pdf, keys)
        blocks = [pdf.iloc[a:b] for a, b in zip(bounds[:-1], bounds[1:])]
        expected = [g for _, g in
                    pdf.groupby(keys, sort=False, dropna=False)]
        assert len(blocks) == len(expected), (keys, bounds)
        for got, exp in zip(blocks, expected):
            pd.testing.assert_frame_equal(got, exp)
