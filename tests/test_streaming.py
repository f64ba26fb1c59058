"""Real Structured Streaming runs (readStream → writeStream,
Trigger.AvailableNow) checked against the equivalent batch computation —
streams and batch share the same transforms, so results must agree.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from okera_trino_spark.sources.catalog import load_table
from okera_trino_spark.streaming.windows import (
    read_events_stream,
    stream_dedup,
    stream_sessions,
    stream_tumbling_counts,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir):
    """Stream source dir: events re-written with µs-NTZ ts (the nanos
    normalization happens at batch load; streams read the normalized
    copy — on a real deployment the ingest layer owns this)."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name != "dedup_sink" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_tumbling_matches_batch(spark, sf_dir, events_stream_dir):
    stream = read_events_stream(spark, events_stream_dir)
    q = _run_stream(stream_tumbling_counts(stream), "tumble_sink")
    got = spark.sql(
        "SELECT window.start AS ws, event_type, n_events FROM tumble_sink"
    ).collect()
    batch = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("window"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("ws"), "event_type", "n_events")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    q.stop()


def test_stream_sessions_run(spark, events_stream_dir):
    stream = read_events_stream(spark, events_stream_dir)
    q = _run_stream(stream_sessions(stream), "session_sink")
    n = spark.sql("SELECT count(*) AS n FROM session_sink").collect()[0].n
    assert n > 0
    q.stop()


def test_stream_stateful_profiles_match_batch(spark, sf_dir, events_stream_dir):
    """applyInPandasWithState running profiles: after one availableNow
    pass the final state per user must equal the batch groupBy."""
    from okera_trino_spark.streaming.stateful import stream_user_profiles

    stream = read_events_stream(spark, events_stream_dir)
    q = (
        stream_user_profiles(stream)
        .writeStream.format("memory").queryName("profile_sink")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # update mode may emit a key several times (once per micro-batch);
    # the LAST emission per key is the final profile.
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 4))
        for r in spark.sql("SELECT * FROM profile_sink").collect()
    }
    batch = {
        r.user_id: (r.n, round(r.s, 4))
        for r in (
            load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()
        )
    }
    assert set(got) == set(batch)
    # single availableNow trigger at fixture scale → one batch per key,
    # so last == only emission and totals must match exactly
    assert got == batch
    q.stop()


def test_stream_dedup_bounded_state(spark, sf_dir, events_stream_dir):
    stream = read_events_stream(spark, events_stream_dir)
    q = _run_stream(stream_dedup(stream), "dedup_sink")
    n = spark.sql("SELECT count(*) AS n FROM dedup_sink").collect()[0].n
    expected = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert n == expected
    q.stop()


def test_checkpoint_restart_is_exactly_once(spark, sf_dir):
    """Exactly-once file pipeline: a parquet-sink stream with a
    checkpoint processes each input file once ACROSS RESTARTS — stop the
    query, add new input, restart with the same checkpoint, and the sink
    holds old+new with no duplicates (the WAL/commit-log recovery the
    engine's ingestion path depends on)."""
    import os

    base = tempfile.mkdtemp(prefix="stream_eo_")
    src, sink, ckpt = (os.path.join(base, d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)
    ev = load_table(spark, sf_dir, "events").limit(500)
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = (spark.readStream.schema(ev.schema).parquet(src)
                  .withColumn("ts", F.col("ts").cast("timestamp")))
        q = (stream.writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()

    try:
        run_once()
        n1 = spark.read.parquet(sink).count()
        assert n1 == first.count()
        second.coalesce(1).write.mode("append").parquet(src)
        run_once()
        out = spark.read.parquet(sink)
        assert out.count() == ev.count(), "restart must not reprocess batch 1"
        assert out.select("event_id").distinct().count() == ev.count()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_stream_join_matches_batch(spark, sf_dir, events_stream_dir):
    """Stream-stream interval join over one availableNow pass must equal
    the batch interval join on the same data."""
    from okera_trino_spark.streaming.windows import stream_stream_join

    stream = read_events_stream(spark, events_stream_dir)
    q = (
        stream_stream_join(stream)
        .writeStream.format("memory").queryName("ss_join_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.view_id, r.purch_id)
           for r in spark.sql("SELECT view_id, purch_id FROM ss_join_sink").collect()}
    ev = load_table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    v = ev.filter("event_type = 'view'").selectExpr(
        "event_id AS view_id", "user_id", "ts AS view_ts")
    p = ev.filter("event_type = 'purchase'").selectExpr(
        "event_id AS purch_id", "user_id AS p_user", "ts AS purch_ts")
    batch = {(r.view_id, r.purch_id) for r in v.join(
        p, (F.col("user_id") == F.col("p_user"))
        & (F.col("purch_ts") >= F.col("view_ts"))
        & (F.col("purch_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES"))
    ).collect()}
    assert got == batch and len(batch) > 0
    q.stop()


def test_stream_pattern_matches_batch_on_finalized_region(spark, sf_dir, events_stream_dir):
    """Streaming CEP (stream_pattern) vs the batch match_recognize
    operator: with the source split into several micro-batches the
    watermark advances between batches, finalizing matches in the
    frozen region — every emitted match must equal the batch operator's
    match with the same (user, match_num), and emitted match numbers
    must form a per-user prefix (no gaps, no reordering)."""
    import tempfile

    from okera_trino_spark.operators.pattern import match_recognize
    from okera_trino_spark.streaming.stateful import stream_pattern

    batch_df = spark.read.parquet(events_stream_dir)
    # The stream source must span several micro-batches IN EVENT-TIME
    # ORDER for the watermark to advance without dropping late rows:
    # write sequential time slices (one file each; file-source order is
    # modification time, so slice k processes before slice k+1).
    from pyspark.sql import Window

    sliced_dir = tempfile.mkdtemp(prefix="events_sliced_")
    slices = batch_df.withColumn(
        "_slice", F.ntile(6).over(Window.orderBy("ts")))
    for k in range(1, 7):
        (slices.filter(F.col("_slice") == k).drop("_slice")
         .coalesce(1).write.mode("append").parquet(sliced_dir))
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sliced_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = stream_pattern(
        stream, "VC+P",
        {"view": "V", "click": "C", "purchase": "P"},
        watermark="30 minutes")
    q = (
        out.writeStream.format("memory").queryName("pattern_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {(r.user_id, r.match_num): (r.matched, r.start_id, r.end_id)
           for r in spark.sql("SELECT * FROM pattern_sink").collect()}
    q.stop()

    want_df = match_recognize(
        batch_df, ["user_id"], ["ts", "event_id"],
        symbols=[("V", F.col("event_type") == "view"),
                 ("C", F.col("event_type") == "click"),
                 ("P", F.col("event_type") == "purchase")],
        pattern="VC+P",
        measures={
            "start_id": lambda c, m: int(c["event_id"].iloc[0]),
            "end_id": lambda c, m: int(c["event_id"].iloc[-1]),
        },
        measure_schema="start_id bigint, end_id bigint",
        used_columns=["event_id"],
    )
    want = {(r.user_id, r.match_num): (r.matched, r.start_id, r.end_id)
            for r in want_df.collect()}

    assert len(got) > 0, "no matches finalized — watermark never advanced"
    # exact agreement on every finalized match
    for k, v in got.items():
        assert want.get(k) == v, (k, v, want.get(k))
    # per-user prefix: emitted match numbers are 1..n without gaps
    by_user: dict = {}
    for (uid, mn) in got:
        by_user.setdefault(uid, []).append(mn)
    for uid, mns in by_user.items():
        assert sorted(mns) == list(range(1, len(mns) + 1)), (uid, mns)


class _FakeState:
    """Minimal GroupState stand-in to drive the CEP updater directly."""

    def __init__(self, buf=None, timed_out=False, wm_ms=0):
        self._buf = buf
        self.hasTimedOut = timed_out
        self._wm_ms = wm_ms
        self.removed = False
        self.updated = None

    @property
    def exists(self):
        return self._buf is not None

    @property
    def get(self):
        return self._buf

    def getCurrentWatermarkMs(self):
        return self._wm_ms

    def remove(self):
        self.removed = True

    def update(self, v):
        self.updated = v

    def setTimeoutTimestamp(self, ts):
        pass


def test_stream_pattern_timeout_flushes_trailing_matches():
    """r7 (ADVICE): EventTimeTimeout eviction must finalize matches
    still buffered as tentative — a key that goes quiet would otherwise
    permanently lose trailing matches the batch operator emits."""
    from okera_trino_spark.streaming.stateful import _make_pattern_updater

    update = _make_pattern_updater("VC+P", {})
    # Buffer holds a complete match ending on the LAST row (the shape
    # held back as tentative by the boundary-extension caution).
    state = _FakeState(
        buf=([10, 20, 30], [101, 102, 103], "VCP", 4), timed_out=True)
    out = list(update((7,), iter([]), state))
    assert state.removed
    assert len(out) == 1
    r = out[0].iloc[0]
    assert (r.user_id, r.match_num, r.matched, r.start_id, r.end_id) == (
        7, 5, "VCP", 101, 103)


def test_stream_pattern_prunes_frozen_filler(spark):
    """r7 (ADVICE): frozen rows up to the last frozen filler '.' can
    never join a future match (matches are contiguous and cannot cross
    the filler) — the updater must drop them so per-key state stays
    bounded for active-but-rarely-matching keys."""
    import pandas as pd

    from okera_trino_spark.streaming.stateful import _make_pattern_updater

    update = _make_pattern_updater("VC+P", {"view": "V", "click": "C",
                                            "purchase": "P"})
    # Watermark at t=100ms; rows at 1..5ms are frozen, mostly junk.
    pdf = pd.DataFrame({
        "ts": pd.to_datetime([1, 2, 3, 4, 5, 200], unit="ms"),
        "event_id": [1, 2, 3, 4, 5, 6],
        "event_type": ["error", "view", "error", "view", "click", "click"],
    })
    state = _FakeState(wm_ms=100)
    list(update((1,), iter([pdf]), state))
    assert state.updated is not None
    ts_us, ids, syms, emitted = state.updated
    # Everything at/before the last frozen '.' (event 3) is pruned;
    # the live tail V C | C (a possible future VC+P) is retained.
    assert ids == [4, 5, 6] and syms == "VCC" and emitted == 0


def test_stream_pattern_skip_modes_cross_batch():
    """r8: the streaming CEP honors the batch operator's AFTER MATCH
    SKIP modes. Driven directly through the updater with a fake state:
    next_row finalizes OVERLAPPING matches in the frozen region and
    consumes only up to each match's start + 1, so a later match
    reuses buffered rows across batches. Trailing unmapped rows ('x'
    -> filler) seal the frozen region — a match touching the last
    frozen row stays tentative by design."""
    import pandas as pd

    from okera_trino_spark.streaming.stateful import _make_pattern_updater

    sym = {"D": "D", "U": "U"}   # event_type IS the letter here

    def batch(ts, ids, types):
        return iter([pd.DataFrame({
            "ts": pd.to_datetime(ts, unit="us"),
            "event_id": ids, "event_type": types})])

    update = _make_pattern_updater("D+U+", sym, after_match="next_row")
    state = _FakeState(wm_ms=1)  # wm 1 ms = 1000 us > all event times
    out = list(update((1,), batch([10, 20, 30, 40, 50], [1, 2, 3, 4, 9],
                                  ["D", "D", "U", "U", "x"]), state))
    got = [(r.match_num, r.matched, r.start_id) for df in out
           for r in df.itertuples()]
    # anchored matches at both D rows: DDUU then DUU (overlap)
    assert got == [(1, "DDUU", 1), (2, "DUU", 2)]

    # past_last on the same input: one non-overlapping match
    update2 = _make_pattern_updater("D+U+", sym, after_match="past_last")
    state2 = _FakeState(wm_ms=1)
    out2 = list(update2((1,), batch([10, 20, 30, 40, 50], [1, 2, 3, 4, 9],
                                    ["D", "D", "U", "U", "x"]), state2))
    got2 = [(r.match_num, r.matched) for df in out2 for r in df.itertuples()]
    assert got2 == [(1, "DDUU")]

    # last:U — the scan resumes AT the last U row; the second match
    # reuses carried rows across TWO updater calls
    update3 = _make_pattern_updater("D+U+D", sym, after_match="last:U")
    state3 = _FakeState(wm_ms=1)
    out3 = list(update3((1,), batch([10, 20, 30, 40], [1, 2, 3, 4],
                                    ["D", "U", "D", "U"]), state3))
    got3 = [(r.match_num, r.matched, r.start_id) for df in out3
            for r in df.itertuples()]
    assert got3 == [(1, "DUD", 1)]
    # consumed only to the U (scan pos 1): rows 2, 3, 4 stay buffered
    assert state3.updated[1] == [2, 3, 4]
    # second micro-batch adds D then a sealing filler: buffer U D U +
    # D . = "UDUD." -> overlapping match DUD on ids 3, 4, 5
    state3b = _FakeState(buf=state3.updated, wm_ms=1)
    out3b = list(update3((1,), batch([50, 60], [5, 9], ["D", "x"]),
                         state3b))
    got3b = [(r.match_num, r.matched, r.start_id) for df in out3b
             for r in df.itertuples()]
    assert got3b == [(2, "DUD", 3)]


def test_stream_pattern_empty_matches():
    """r8: an empty-matchable pattern (C*) must never stall or
    mis-host in the streaming walk: empty matches advance the scan one
    row in EVERY skip mode, are hosted by their own row
    (start_id == end_id, matched ''), and one at/past the finalization
    boundary is held for a later batch — the batch operator's
    end-of-string exclusion."""
    import pandas as pd

    from okera_trino_spark.streaming.stateful import _make_pattern_updater

    sym = {"click": "C"}

    def batch(ts, ids, types):
        return iter([pd.DataFrame({
            "ts": pd.to_datetime(ts, unit="us"),
            "event_id": ids, "event_type": types})])

    for mode, want in [
        ("past_last", [(1, "", 1, 1), (2, "CC", 2, 3)]),
        # next_row re-enters the run: CC at row 2, then C at row 3.
        ("next_row", [(1, "", 1, 1), (2, "CC", 2, 3), (3, "C", 3, 3)]),
    ]:
        update = _make_pattern_updater("C*", sym, after_match=mode)
        state = _FakeState(wm_ms=1)   # 1 ms > all event times: frozen
        out = list(update((1,), batch([10, 20, 30, 40], [1, 2, 3, 4],
                                      ["x", "click", "click", "x"]),
                          state))
        got = [(r.match_num, r.matched, r.start_id, r.end_id)
               for df in out for r in df.itertuples()]
        assert got == want, (mode, got)


def test_stream_pattern_skip_to_subset():
    """late r8: a multi-letter (SUBSET) skip symbol in the streaming
    walk — the scan resumes AT the last row mapped to ANY member."""
    import pandas as pd

    from okera_trino_spark.streaming.stateful import _make_pattern_updater

    sym = {"D": "D", "U": "U"}

    def batch(ts, ids, types):
        return iter([pd.DataFrame({
            "ts": pd.to_datetime(ts, unit="us"),
            "event_id": ids, "event_type": types})])

    update = _make_pattern_updater("D+U+D", sym, after_match="last:UD")
    state = _FakeState(wm_ms=1)
    out = list(update((1,), batch([10, 20, 30, 40, 50, 60],
                                  [1, 2, 3, 4, 5, 9],
                                  ["D", "U", "D", "U", "D", "x"]), state))
    got = [(r.match_num, r.matched, r.start_id) for df in out
           for r in df.itertuples()]
    # match 1 = DUD (ids 1-3); last of {U, D} = the final D (id 3),
    # the scan resumes AT it → match 2 = DUD (ids 3-5), row reused.
    assert got == [(1, "DUD", 1), (2, "DUD", 3)]
