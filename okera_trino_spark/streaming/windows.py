"""Streaming operators — SURVEY.md §2.3 S1–S6.

The reference is batch-only (no streaming symbols anywhere in its
source); these are the Structured Streaming extensions the 100-TB north
star requires. Each operator exists in two forms:

- a *batch-checkable* registered query over the ``events`` fixture
  (identical semantics, DuckDB-oracle-verified — time windowing is pure
  relational algebra over the timestamp column), and
- a *stream builder* (``stream_*``) applying the same transform to an
  unbounded DataFrame with watermarking; exercised by
  tests/test_streaming.py through a real readStream → writeStream
  micro-batch run.

Scale notes: windowed streaming aggregation state is partitioned by
(window, keys) across executors; watermarks bound state size. Session
windows merge per key — session_window + watermark is the supported
scalable form (applyInPandasWithState would be the escape hatch for
custom state machines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


# --------------------------------------------------------------- S1 tumbling
@query(
    "q_stream_tumble",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def q_stream_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 tumbling 1-hour window aggregate (batch form). F.window is the
    same expression streaming uses; a 1h tumble aligns with date_trunc
    in the oracle."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), r4(F.sum("value")).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


# ---------------------------------------------------------------- S2 sliding
@query(
    "q_stream_slide",
    oracle="""
    WITH offsets AS (SELECT unnest([0, 900, 1800, 2700]) AS off)
    SELECT strftime(
             to_timestamp((epoch_us(e.ts) // 1000000 - off.off) // 3600 * 3600 + off.off),
             '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events
    FROM events e CROSS JOIN offsets off
    GROUP BY 1
    """,
    tags=("streaming",),
)
def q_stream_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 sliding window: 1 hour long, sliding every 15 minutes — each
    event lands in 4 windows. The oracle reconstructs the window set
    with integer epoch arithmetic over the 4 slide offsets."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "n_events",
        )
    )


# ---------------------------------------------------------------- S3 session
@query(
    "q_stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("streaming",),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 session window (30-minute gap) per user. Spark's
    session_window merges adjacent events server-side; the oracle is the
    classic gaps-and-islands rewrite (SURVEY.md §7.4 risk 5: oracle
    written first, Spark matched to it).

    Boundary convention: Spark's session window is HALF-OPEN — an event
    landing exactly at last_ts + gap starts a NEW session — so the
    oracle's gap test is ``>= INTERVAL 30 MINUTE``, not ``>``."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), r4(F.sum("value")).alias("sum_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT).alias("session_start"),
            "n_events", "sum_value",
        )
    )


# ------------------------------------------------------------------ S5 dedup
@query(
    "q_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming",),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 stateful dedup (dropDuplicates). Restricted to the dedup keys
    so the result is deterministic (which full row survives is
    engine-dependent); streaming form pairs this with a watermark to
    bound state (see stream_dedup)."""
    e = t(spark, sf_dir, "events")
    return e.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])


# --------------------------------------------------------------- S4 watermark
@query(
    "q_stream_watermark",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL 6 HOUR FROM events)
    """,
    tags=("streaming",),
)
def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 watermark semantics, batch-checkable form: rows within the
    watermark horizon of the observed max event time are "on time" —
    exactly the retention predicate withWatermark applies to streaming
    state. The streaming form is stream_tumbling_counts below (real
    watermark, exercised in tests/test_streaming.py)."""
    e = t(spark, sf_dir, "events")
    horizon = e.agg((F.max("ts") - F.expr("INTERVAL 6 HOUR")).alias("h"))
    return (
        e.join(F.broadcast(horizon), F.col("ts") >= F.col("h"))
        .select("event_id", "user_id", "event_type")
    )


# ------------------------------------------------------ S6 stream-static join
@query(
    "q_stream_static_join",
    oracle="""
    SELECT e.event_id, e.event_type, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags=("streaming", "join"),
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 stream-static join, batch-checkable form: events enriched with
    the customer dim on user_id. In streaming the static side broadcasts
    per micro-batch with no state (stream_static_join below); the batch
    plan is the identical broadcast-hash join."""
    e = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), F.col("user_id") == F.col("c_custkey"))
        .select("event_id", "event_type", "c_name", "c_mktsegment")
    )


# ----------------------------------------------------------- stream builders
def read_events_stream(spark: SparkSession, source_dir: str,
                       schema: str | None = None) -> DataFrame:
    """File-source stream over parquet events (ts already µs NTZ)."""
    schema = schema or (
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    # Watermarks require TIMESTAMP (LTZ); the NTZ event time is cast at
    # the stream boundary — a uniform session-tz reinterpretation that
    # preserves ordering and window alignment.
    return (
        spark.readStream.schema(schema).parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def stream_tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """S1+S4: tumbling 1h counts with a watermark bounding state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )


def stream_sliding_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """S2+S4: 1h windows sliding every 15 minutes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n_events"))
    )


def stream_sessions(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """S3+S4: session windows with merge-on-gap semantics."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
    )


def stream_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """S5: drop duplicate event_ids within the watermark horizon —
    dropDuplicates state is GC'd past the watermark, keeping state
    bounded on an unbounded stream."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def stream_static_join(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """S6: stream-static join — the static side is broadcast per
    micro-batch; no state is kept."""
    return events.join(F.broadcast(dim), on=on, how="inner")


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purch_id, v.user_id,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_time,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purch_time
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    tags=("streaming", "join"),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-ext stream-stream interval join, batch-checkable form: each view
    pairs with the same user's purchases within the next 30 minutes. In
    streaming BOTH sides are unbounded; the watermark + time-range
    condition lets Spark GC join state past the horizon
    (stream_stream_join below runs the identical transform as a real
    micro-batch query in tests/test_streaming.py).

    Scale: state per key is bounded by (watermark + interval) of events,
    independent of stream length — the interval bound is what makes an
    unbounded self-join feasible at all.
    """
    ev = t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purch_id"), F.col("user_id").alias("p_user"),
        F.col("ts").alias("purch_ts"))
    return (
        v.join(p, (F.col("user_id") == F.col("p_user"))
               & (F.col("purch_ts") >= F.col("view_ts"))
               & (F.col("purch_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")))
        .select("view_id", "purch_id", "user_id",
                F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_time"),
                F.date_format("purch_ts", "yyyy-MM-dd HH:mm:ss").alias("purch_time"))
    )


def stream_stream_join(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """S-ext: stream-stream interval join with watermarks on BOTH sides —
    view→purchase pairing within 30 minutes. Join state for each side is
    dropped once the watermark passes the interval bound."""
    v = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("ts").alias("view_ts")).withWatermark("view_ts", watermark)
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purch_id"), F.col("user_id").alias("p_user"),
        F.col("ts").alias("purch_ts")).withWatermark("purch_ts", watermark)
    return v.join(
        p, (F.col("user_id") == F.col("p_user"))
        & (F.col("purch_ts") >= F.col("view_ts"))
        & (F.col("purch_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")))
