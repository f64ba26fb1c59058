"""Custom stateful streaming operator — applyInPandasWithState.

The reference has no streaming at all (batch Trino connector); this is
the north-star extension's escape hatch for state machines that
window/session/dropDuplicates can't express: arbitrary per-key state
updated per micro-batch with Arrow-batched pandas, timeout-driven
eviction, and bounded memory (state is per key, partitioned across
executors like any keyed state).

Demonstrated operator: per-user running activity profile (event count,
value sum, last-seen timestamp) emitted incrementally — the canonical
"profile store fed by a stream" shape for feature pipelines.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output of the profile operator (stable schema; one row per key per
#: micro-batch in which the key saw events).
PROFILE_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, sum_value DOUBLE, last_seen TIMESTAMP"
)
_STATE_SCHEMA = "n BIGINT, s DOUBLE, last LONG"


def _update_profile(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into running state.

    State is (count, sum, last-seen-µs). Emits the refreshed profile
    once per batch; on processing-time timeout the key's state is
    dropped (the stream-side analogue of watermark eviction)."""
    if state.hasTimedOut:
        state.remove()
        return
    n, s, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_last = pdf["ts"].max()
        if pd.notna(batch_last):
            last = max(last, int(batch_last.value // 1000))
    state.update((n, s, last))
    state.setTimeoutDuration(60 * 60 * 1000)
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "sum_value": [s],
        "last_seen": [pd.Timestamp(last * 1000)],
    })


def stream_user_profiles(events: DataFrame) -> DataFrame:
    """S-custom: per-user running profiles via applyInPandasWithState.

    groupBy(user_id) partitions state by key across executors; each
    micro-batch routes a key's new rows to its state partition (one
    shuffle per batch, keyed — the same layout Spark's built-in
    streaming aggs use). Update output mode emits changed keys only.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ------------------------------------------------------- streaming CEP
#: Streaming row-pattern output (one row per FINALIZED match).
PATTERN_SCHEMA = (
    "user_id BIGINT, match_num BIGINT, matched STRING, "
    "start_id BIGINT, end_id BIGINT"
)
#: Per-key buffer: event times (µs), ids, classified symbol chars, and
#: the count of matches already emitted (match_num continuity).
_PATTERN_STATE_SCHEMA = (
    "ts ARRAY<LONG>, ids ARRAY<LONG>, syms STRING, emitted BIGINT"
)


def _make_pattern_updater(pattern: str, symbols: dict[str, str],
                          after_match: str = "past_last"):
    """Build the applyInPandasWithState update function for a row
    pattern. ``symbols`` maps event_type -> single-letter symbol;
    unmapped rows classify as the unmatchable '.'. ``after_match``
    takes the batch operator's modes (r8): ``past_last`` /
    ``next_row`` / ``first:X`` / ``last:X`` — the skip rule decides
    both the scan-restart position AND how many rows an emitted match
    CONSUMES (under overlap modes earlier rows stay buffered because a
    later match may reuse them)."""
    import re

    compiled = re.compile(pattern)
    skip_sym = None
    if after_match.startswith(("first:", "last:")):
        mode, _, skip_sym = after_match.partition(":")
        after_match = mode
    if after_match not in ("past_last", "next_row", "first", "last"):
        raise ValueError(f"after_match {after_match!r}")

    def finalize(s, ids, emitted, key, limit):
        """Emit every match whose end is strictly below ``limit``
        (match-complete region), walking with the skip rule. Returns
        (rows, emitted, consumed_to): rows before consumed_to can
        never appear in a future match, so the caller may drop them."""
        out, pos, consumed_to = [], 0, 0
        while True:
            m = compiled.search(s, pos)
            # An EMPTY match at the frozen boundary belongs to the
            # not-yet-frozen row there — hold it (the batch operator's
            # end-of-string exclusion, r8).
            if (m is None or m.end() > limit
                    or (m.end() == m.start() and m.start() >= limit)):
                break
            emitted += 1
            # An empty match is hosted BY the row at its position
            # (start_id == end_id, matched '') — the batch operator's
            # ONE ROW PER MATCH shape.
            out.append((key[0], emitted, m.group(0),
                        ids[m.start()],
                        ids[m.end() - 1 if m.end() > m.start()
                            else m.start()]))
            if m.end() == m.start():
                # Empty match: every skip mode resumes at the next row
                # (nothing consumed; SKIP TO FIRST/LAST X has no X row
                # to land on) — the batch operator's r8 rule; never
                # stall the scan position.
                pos = m.start() + 1
            elif after_match == "past_last":
                pos = m.end()
            elif after_match == "next_row":
                pos = m.start() + 1
            else:
                g = m.group(0)
                if len(skip_sym) == 1:
                    idx = (g.find(skip_sym) if after_match == "first"
                           else g.rfind(skip_sym))
                else:   # SUBSET target (late r8) — the batch walk's rule
                    hits = [i for i in
                            (g.find(c) if after_match == "first"
                             else g.rfind(c) for c in skip_sym)
                            if i >= 0]
                    idx = ((min(hits) if after_match == "first"
                            else max(hits)) if hits else -1)
                if idx < 0:
                    raise ValueError(
                        f"AFTER MATCH SKIP TO {after_match.upper()} "
                        f"{skip_sym}: the match {g!r} contains no "
                        f"{skip_sym} row")
                if idx == 0:
                    raise ValueError(
                        f"AFTER MATCH SKIP TO {after_match.upper()} "
                        f"{skip_sym}: cannot skip to the first row of "
                        "the match (infinite loop)")
                pos = m.start() + idx
            consumed_to = pos
        return out, emitted, consumed_to

    def update(key: tuple, batches, state: GroupState):
        if state.hasTimedOut:
            # Horizon eviction (r7, was a silent drop): the key has
            # been idle 24 h of EVENT time past the watermark, so every
            # buffered row is deep inside the frozen region. Finalize
            # the whole buffer — including matches that end on its last
            # row (the greedy-extension caution no longer applies: the
            # horizon IS the cut; holding them would drop them forever,
            # where the batch operator emits them).
            ts, ids, syms, emitted = (
                state.get if state.exists else ([], [], "", 0))
            out, emitted, _ = finalize(syms, ids, emitted, key, len(syms))
            state.remove()
            if out:
                yield pd.DataFrame(
                    out, columns=["user_id", "match_num", "matched",
                                  "start_id", "end_id"])
            return
        ts, ids, syms, emitted = (
            state.get if state.exists else ([], [], "", 0))
        rows = list(zip(ts, ids, syms))
        for pdf in batches:
            for t, i, et in zip(pdf["ts"], pdf["event_id"],
                                pdf["event_type"]):
                rows.append((int(t.value // 1000), int(i),
                             symbols.get(et, ".")))
        rows.sort()
        wm = state.getCurrentWatermarkMs() * 1000  # µs
        # Frozen prefix: rows below the watermark can no longer gain
        # earlier-or-between arrivals (Spark drops later-than-watermark
        # lateness), so matching over them is final — EXCEPT a match
        # touching the last frozen row, whose greedy extension could
        # still change when rows at/after the watermark arrive.
        n_frozen = sum(1 for r in rows if r[0] < wm)
        s = "".join(r[2] for r in rows)
        # Finalize matches ending STRICTLY inside the frozen prefix
        # (one touching the boundary could still be greedily extended
        # by a not-yet-arrived row at/after the watermark) — walking
        # with the configured skip rule; consumed_to is the scan
        # position, so under overlap modes rows an emitted match used
        # stay buffered for the next (overlapping) match.
        out, emitted, consumed_to = finalize(
            s, [r[1] for r in rows], emitted, key, n_frozen - 1)
        rows = rows[consumed_to:]
        n_frozen -= consumed_to
        # Bound state (r7): a future match is contiguous and can never
        # cross the unmatchable filler '.', so frozen rows up to the
        # LAST frozen filler can never join one — drop them. This keeps
        # per-key state bounded for a continuously active key that
        # rarely matches (previously such a key accumulated frozen
        # non-matching rows until the 24 h idle eviction).
        if n_frozen > 0:
            cut = "".join(r[2] for r in rows[:n_frozen]).rfind(".") + 1
            if cut:
                rows = rows[cut:]
        state.update(([r[0] for r in rows], [r[1] for r in rows],
                      "".join(r[2] for r in rows), emitted))
        # Event-time timeout: evict a key 24h (event time) past the
        # watermark — no new row can complete its pending matches then.
        state.setTimeoutTimestamp(
            state.getCurrentWatermarkMs() + 24 * 60 * 60 * 1000)
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "match_num", "matched",
                              "start_id", "end_id"])

    return update


def stream_pattern(events: DataFrame, pattern: str,
                   symbols: dict[str, str],
                   watermark: str = "1 hour",
                   after_match: str = "past_last") -> DataFrame:
    """S-custom streaming CEP: row-pattern matching over an unbounded
    event stream — the streaming twin of operators/pattern.py
    (same ONE ROW PER MATCH / greedy semantics and, since r8, the same
    AFTER MATCH SKIP modes: past_last, next_row — overlapping matches
    — and first:X / last:X), built on applyInPandasWithState because
    no built-in streaming operator holds cross-row ordered state.
    Under overlap modes an emitted match consumes rows only up to the
    skip position, so later matches can reuse its remaining rows
    across micro-batches — the cross-batch analogue of the batch
    operator's restart rule.

    Correctness under late data: per key the buffer holds pending rows;
    each micro-batch sorts arrivals in, then finalizes ONLY matches that
    end strictly inside the frozen prefix (event time < watermark) —
    a match touching the frozen boundary could still be greedily
    extended by a not-yet-arrived row at/after the watermark, so it
    stays pending. Emitted matches consume their rows (skip past last
    row across batches); match_num continues across batches via state.

    Scale: state is per key and bounded — matched rows are consumed,
    and frozen rows up to the last frozen filler symbol are pruned
    every batch (a match cannot cross the filler), so a continuously
    active key holds only the post-filler frozen tail plus the
    unfrozen window; a key idle 24 h of event time is evicted by
    timeout, FINALIZING its buffered matches first (r7 — previously a
    silent drop of trailing matches). Each micro-batch is one keyed
    shuffle, the same layout as built-in streaming aggregation.
    tests/test_streaming.py proves micro-batch output matches the batch
    operator on the finalized region.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_pattern_updater(pattern, symbols, after_match),
            outputStructType=PATTERN_SCHEMA,
            stateStructType=_PATTERN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
