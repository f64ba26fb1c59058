"""Behavioral tests for the two-phase global row-number
(`global_sort_positions`) — the scalable replacement for an
unpartitioned ranking window.

The subtle risk in the two-phase form: the per-range counts job and the
final job evaluate `repartitionByRange` + `spark_partition_id()` in TWO
separate Spark jobs, so range boundary sampling must be deterministic
across them or offsets would attach to the wrong ranges. These tests
pin exact rank correctness (vs a Python sort) and run-to-run
determinism on data large enough to occupy many ranges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from okera_trino_spark.operators.sorts_sets import global_sort_positions


def _expected_positions(rows, keyfn):
    ordered = sorted(rows, key=keyfn)
    return {r[0]: i + 1 for i, r in enumerate(ordered)}


def test_positions_match_python_rank_across_many_ranges(spark):
    """500 rows through 8 range partitions, DESC NULLS LAST + tiebreak:
    every position equals the rank a single-process sort assigns."""
    import random

    rng = random.Random(7)
    rows = [(i, rng.choice([None, round(rng.uniform(-100, 100), 3)]))
            for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = global_sort_positions(
        df, F.col("v").desc_nulls_last(), F.col("id"), n_ranges=8)
    got = {r.id: r.sort_pos for r in out.collect()}
    # DESC NULLS LAST: non-nulls descending, then nulls; ties impossible
    # (id is in the key)
    expect = _expected_positions(
        rows, lambda r: (r[1] is None, -(r[1] or 0.0), r[0]))
    assert got == expect
    assert sorted(got.values()) == list(range(1, 501))  # a true permutation


def test_positions_are_deterministic_across_jobs(spark):
    """Two independent evaluations (each running its own counts job +
    final job) must produce identical positions — range boundary
    sampling is seeded deterministically."""
    df = spark.range(0, 2000).select(
        F.col("id"), (F.hash("id") % 1000).alias("v"))
    a = {r.id: r.sort_pos for r in global_sort_positions(
        df, F.col("v").asc(), F.col("id"), n_ranges=16).collect()}
    b = {r.id: r.sort_pos for r in global_sort_positions(
        df, F.col("v").asc(), F.col("id"), n_ranges=16).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, 2001))


def test_single_range_degenerates_to_plain_row_number(spark):
    """n_ranges=1 must still be correct (offset map has one entry)."""
    df = spark.createDataFrame([(1, "b"), (2, "a"), (3, "c")], "id long, s string")
    got = {r.id: r.sort_pos for r in global_sort_positions(
        df, F.col("s").asc(), n_ranges=1).collect()}
    assert got == {2: 1, 1: 2, 3: 3}


def test_subsampled_regime_positions_form_permutation(spark):
    """The regime that broke before the localCheckpoint fix: enough rows
    per input partition (300k rows / 2 partitions) that RangePartitioner
    SUBSAMPLES instead of taking everything, so two independent jobs
    would sample different split points. Positions must still form an
    exact permutation of 1..N — duplicated/missing positions are the
    silent-corruption signature of per-job boundary drift."""
    n = 300_000
    df = (
        spark.range(0, n, numPartitions=2)
        .select(F.col("id"), (F.hash("id") % 100_000).alias("v"))
    )
    out = global_sort_positions(df, F.col("v").asc(), F.col("id"), n_ranges=32)
    pos = [r.sort_pos for r in out.select("sort_pos").collect()]
    assert sorted(pos) == list(range(1, n + 1))


def test_positions_long_typed(spark):
    """sort_pos is BIGINT — at 100 TB row counts exceed int32, and the
    DuckDB oracle's ROW_NUMBER() is BIGINT so schema parity needs it."""
    df = spark.createDataFrame([(1, 5), (2, 3)], "id long, v long")
    out = global_sort_positions(df, F.col("v").asc(), n_ranges=2)
    assert dict(out.dtypes)["sort_pos"] == "bigint"


def test_grouped_positions_match_python_rank_per_group(spark):
    """grouped_sort_positions (r12): per-group 1-based positions equal
    a single-process per-group sort, across many ranges and uneven
    group sizes (one group dominates, like a majority language)."""
    import random

    from okera_trino_spark.operators.sorts_sets import (
        grouped_sort_positions,
    )

    rng = random.Random(13)
    rows = [(i, rng.choices(["en", "de", "fr"], weights=[8, 3, 1])[0],
             round(rng.uniform(0, 50), 3)) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = grouped_sort_positions(
        df, "g", F.col("v").asc(), F.col("id").asc(), n_ranges=8,
        pos_col="p")
    got = {(r.g, r.id): r.p for r in out.collect()}
    by_g = {}
    for i, g, v in rows:
        by_g.setdefault(g, []).append((v, i))
    expect = {}
    for g, vs in by_g.items():
        for rank, (_, i) in enumerate(sorted(vs), start=1):
            expect[(g, i)] = rank
    assert got == expect
    # each group's positions form a 1..n_g permutation
    for g, vs in by_g.items():
        ps = sorted(p for (gg, _), p in got.items() if gg == g)
        assert ps == list(range(1, len(vs) + 1))


def test_grouped_positions_separator_groups_and_null_contract(spark):
    """r12 ADVICE: the offset map is keyed structurally (range ->
    group -> offset), so group values containing the old '|' separator
    can no longer alias each other ('a|b' vs 'a' + range suffix), and
    a NULL group raises the documented contract error instead of
    crashing the driver-side sort on mixed tuples."""
    import pytest

    from okera_trino_spark.operators.sorts_sets import (
        grouped_sort_positions,
    )

    rows = [(i, ["a|b", "a", "1|a", "b"][i % 4], float(i * 7 % 31))
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = grouped_sort_positions(
        df, "g", F.col("v").asc(), F.col("id").asc(), n_ranges=8,
        pos_col="p")
    got = {(r.g, r.id): r.p for r in out.collect()}
    by_g = {}
    for i, g, v in rows:
        by_g.setdefault(g, []).append((v, i))
    expect = {}
    for g, vs in by_g.items():
        for rank, (_, i) in enumerate(sorted(vs), start=1):
            expect[(g, i)] = rank
    assert got == expect

    null_df = spark.createDataFrame(
        [(1, "en", 1.0), (2, None, 2.0)], "id long, g string, v double")
    with pytest.raises(ValueError, match="non-null"):
        grouped_sort_positions(null_df, "g", F.col("v").asc())


def test_grouped_positions_long_group_under_ansi(spark):
    """r13 ADVICE: with a LongType group column whose collected values
    fit int32, F.lit(g) used to build IntegerType map keys, and the
    element_at(map<int,...>, long_col) lookup leaned on the legacy
    implicit long->int key cast — which ANSI mode rejects at analysis.
    Keys are now cast to the group column's actual dataType, so the
    helper must work (and agree with a local rank) under
    spark.sql.ansi.enabled=true."""
    from okera_trino_spark.operators.sorts_sets import (
        grouped_sort_positions,
    )

    rows = [(i, i % 3, float(i * 11 % 29)) for i in range(180)]
    df = spark.createDataFrame(rows, "id long, g long, v double")
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        out = grouped_sort_positions(
            df, "g", F.col("v").asc(), F.col("id").asc(), n_ranges=6,
            pos_col="p")
        got = {(r.g, r.id): r.p for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    by_g = {}
    for i, g, v in rows:
        by_g.setdefault(g, []).append((v, i))
    expect = {}
    for g, vs in by_g.items():
        for rank, (_, i) in enumerate(sorted(vs), start=1):
            expect[(g, i)] = rank
    assert got == expect


def test_grouped_positions_deterministic(spark):
    from okera_trino_spark.operators.sorts_sets import (
        grouped_sort_positions,
    )

    df = spark.range(0, 1500).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("g"),
        (F.hash("id") % 500).alias("v"))
    a = {(r.g, r.id): r.sort_pos for r in grouped_sort_positions(
        df, "g", F.col("v").asc(), F.col("id").asc()).collect()}
    b = {(r.g, r.id): r.sort_pos for r in grouped_sort_positions(
        df, "g", F.col("v").asc(), F.col("id").asc()).collect()}
    assert a == b
