"""Row-pattern recognition — a Spark-first MATCH_RECOGNIZE subset.

Trino ships SQL row-pattern matching (MATCH_RECOGNIZE, part of the
Trino-400 surface the reference delegates to its hosting engine); Spark
has no equivalent, and the string front end refuses the syntax with a
named error (functions/trino_sql.py) rather than mis-translating. This
module supplies the OPERATOR under the restricted semantics that cover
the funnel/journey queries MATCH_RECOGNIZE is actually used for in
events analytics:

- ``ONE ROW PER MATCH`` output (default), or ``ALL ROWS PER MATCH``
  (r7, ``all_rows=True``): every matched row with per-row classifier;
- ``AFTER MATCH SKIP PAST LAST ROW`` (non-overlapping, leftmost-first,
  greedy quantifiers — exactly Python/RE2 ``finditer`` semantics);
- row classification (DEFINE) is pattern-independent: each symbol is a
  plain boolean Column over the row, evaluated JVM-side before any
  Python runs; the first symbol whose predicate holds classifies the
  row (MATCH_RECOGNIZE's lexical DEFINE order). PREV/NEXT-style
  conditions are expressed by passing lag/lead columns into the
  predicate — the caller builds them with a window, keeping that part
  in codegen too.

Execution shape (100 TB): classification and the (partition, order)
shuffle are pure Catalyst; only the regex walk runs in Python — as a
STREAMING ``mapInPandas`` over ``repartition(keys) +
sortWithinPartitions(keys, order)``, not per-group ``applyInPandas``:
with high key cardinality (millions of users) one Python call per
GROUP is the dominant cost (measured 5x on the funnel key), while the
streaming form processes every group inside an Arrow batch in one call,
carrying the possibly-split trailing group over to the next batch. One
shuffle, one pass, measures computed on the matched row slice. The
per-key group must fit executor memory: the same contract as session
windows / applyInPandasWithState, and the natural key (user, session,
device) is exactly the MATCH_RECOGNIZE PARTITION BY.
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import t
from okera_trino_spark.registry import query

#: Pattern alphabet guard: single-uppercase-letter symbols composed with
#: regex quantifiers/groups/alternation, plus the ^/$ partition anchors
#: (r8 — the per-partition symbol string IS the row sequence, so
#: Python's string anchors coincide with Trino's partition anchors).
#: Anything else (dots, classes) would silently match the non-symbol
#: filler char.
_PATTERN_OK_RE = re.compile(r"^[A-Z()|*+?{},0-9\s^$]+$")

#: Classification char for rows matching no symbol. '.' is safe filler:
#: it can appear in the symbol STRING but never in a validated PATTERN,
#: so it can never be matched.
_NO_SYMBOL = "."


def _translate_exclusions(pattern: str) -> tuple[str, list[str]]:
    """Rewrite Trino pattern exclusions ``{- X -}`` into NAMED GROUPS
    ``(?P<_excN>X)`` and return (translated pattern, group names).

    r9: exclusions may sit inside (quantified) groups and carry their
    own quantifiers — patterns with exclusions compile under the
    ``regex`` module, whose ``Match.spans(name)`` reports EVERY
    repetition's span (stdlib ``re`` keeps only the last, which is why
    these forms used to refuse). Nested exclusions stay refused: the
    outer exclusion already drops the inner's rows, so the nesting is
    at best redundant and Trino itself rejects it."""
    out, names = "", []
    i = 0
    while i < len(pattern):
        if pattern.startswith("{-", i):
            j = pattern.find("-}", i)
            if j < 0:
                raise ValueError("unbalanced pattern exclusion {-")
            inner = pattern[i + 2:j]
            if "{-" in inner:
                raise ValueError("nested pattern exclusions")
            name = f"_exc{len(names)}"
            names.append(name)
            out += f"(?P<{name}>{inner})"
            i = j + 2
        else:
            out += pattern[i]
            i += 1
    return out, names


def order_sort_cols(order_by: list[str]) -> tuple[list[str], list[Column]]:
    """Split ``order_by`` entries (plain names, optionally suffixed
    ``DESC`` — Trino MATCH_RECOGNIZE ORDER BY direction, r8) into the
    bare column NAMES (for pruning/schema) and the Spark sort COLUMNS
    (descending where suffixed)."""
    names: list[str] = []
    cols: list[Column] = []
    for c in order_by:
        dm = re.match(r"^(.*?)\s+DESC$", c.strip(), re.IGNORECASE)
        name = (dm.group(1) if dm else c.strip()).strip("`")
        names.append(name)
        cols.append(F.col(name).desc() if dm else F.col(name))
    return names, cols


class _LazyRows:
    """Deferred stand-in for the per-match row slice
    ``group.iloc[start:end]`` handed to measure callables.

    Measured (r15, guide §4): slicing the group frame per match was
    78% of the emit walk's profile on q_trino_sql_mr_prev (32k matches
    at sf0.1, ~2.0 s of 2.6 s single-threaded) — yet every measure the
    engine constructs touches the rows through only ``len()``, column
    ``[]``-access and ``.iloc``/Series attributes, and the hot
    measures (``count(*)``, match_number(), classifier(), pattern
    aggregates over ``m`` alone) never touch the rows at all. The
    proxy answers ``len()`` from the span arithmetic for free and
    materializes the real pandas slice only on the first genuine
    attribute/item access, so match-only measures cost zero slices.

    Not a general DataFrame impostor: anything beyond len/item/attr
    (``isinstance`` checks, binary dispatch) would bypass it — the
    engine's own measure constructors (operators/pattern.py,
    functions/trino_sql.py lowering) are the closed set of callers and
    use none of that (asserted by tests/test_pattern.py passing
    unchanged)."""

    __slots__ = ("_g", "_a", "_b", "_df")

    def __init__(self, g: pd.DataFrame, a: int, b: int) -> None:
        self._g, self._a, self._b = g, a, b
        self._df = None

    def _materialize(self) -> pd.DataFrame:
        if self._df is None:
            self._df = self._g.iloc[self._a:self._b]
        return self._df

    def __len__(self) -> int:
        return self._b - self._a

    def __getitem__(self, key):
        return self._materialize()[key]

    def __getattr__(self, name):
        return getattr(self._materialize(), name)


def _group_bounds(pdf: pd.DataFrame, partition_by: list[str]):
    """Group start/end offsets over a key-sorted partition frame (r15,
    guide §4.2): rows arrive sorted by the partition key, so every
    group is one contiguous block — the boundaries are exactly where
    consecutive keys differ (NaN == NaN, matching
    ``groupby(dropna=False)``). Iterating blocks by offset replaces the
    per-group ``pdf.groupby`` frames in the emit walk entirely: the
    walk touches pandas once per PARTITION (one ``iloc`` take for all
    matched rows), not once per group — measured 1.52 -> 0.57 s on
    q_events_pattern_rows and 3.42 -> 0.81 s on q_events_pattern_empty
    (1500 groups, sf0.1, interleaved A/B)."""
    import numpy as np

    k = pdf[partition_by]
    cur = k.iloc[1:].reset_index(drop=True)
    prv = k.iloc[:-1].reset_index(drop=True)
    same = ((cur == prv) | (cur.isna() & prv.isna())).all(axis=1)
    return np.concatenate(
        ([0], np.nonzero(~same.to_numpy())[0] + 1, [len(pdf)]))


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    symbols: list[tuple[str, Column]],
    pattern: str,
    measures: dict[str, Callable[[pd.DataFrame, re.Match], object]] | None = None,
    measure_schema: str = "",
    used_columns: list[str] | None = None,
    all_rows: bool = False,
    after_match: str = "past_last",
    with_unmatched: bool = False,
    show_empty: bool = False,
) -> DataFrame:
    """Row-pattern matching over ``df`` (ONE ROW PER MATCH by default,
    ALL ROWS PER MATCH with ``all_rows=True``).

    ``symbols`` is an ordered list of (single uppercase letter, boolean
    Column); a row takes the FIRST letter whose predicate is true, else
    an unmatchable filler. ``order_by`` entries may carry a ``DESC``
    suffix (r8) — the pattern then walks that column descending,
    Trino's MATCH_RECOGNIZE ORDER BY direction. ``pattern`` may use
    ``^``/``$`` partition anchors and ``{- X -}`` output exclusions
    (r8): excluded rows stay part of the match — numbering, measures
    and skip positions all see them — but are dropped from ALL-ROWS
    output (Trino's exclusion semantics; irrelevant under ONE ROW PER
    MATCH, as Trino). ``pattern`` is a regex over those letters
    (quantifiers, groups, alternation). Output columns: the partition
    keys, ``match_num`` (1-based per partition, in order-by order),
    ``matched`` (the matched symbol string), plus one column per entry
    of ``measures`` — each a callable over (matched row slice, regex
    match) declared in ``measure_schema`` (DDL fragment, e.g.
    ``"n_clicks bigint, total double"``).

    ``used_columns`` lists the columns the measure callables read; when
    given, everything else is pruned BEFORE the Arrow transfer — on a
    wide events table the partition/order/symbol columns are a small
    fraction of the row, and shipping unread columns through
    applyInPandas is pure serialization cost (measured ~2x on the
    funnel key). None (default) keeps every column.

    ``all_rows=True`` is Trino's ``ALL ROWS PER MATCH`` (r7): instead
    of one summary row, every MATCHED input row is emitted with its
    retained columns (post-pruning) plus ``match_num`` and
    ``classifier`` (the per-row pattern symbol — Trino's
    ``classifier()``). Unmatched rows are omitted (Trino's default
    ``OMIT EMPTY MATCHES`` shape for non-empty patterns). In this mode
    ``measures`` callables receive the SAME (matched row slice, regex
    match) arguments but return a per-row VECTOR (len == match length)
    for Trino's default RUNNING semantics — e.g. a cumsum — or a
    scalar, which broadcasts to every row of the match (FINAL
    semantics / constants).

    ``after_match`` (r8) selects Trino's AFTER MATCH SKIP mode:
    ``"past_last"`` (default) resumes the scan after the last matched
    row — non-overlapping ``finditer`` semantics; ``"next_row"``
    (Trino ``SKIP TO NEXT ROW``) resumes at the row after each match's
    FIRST row, yielding every position where an anchored leftmost-
    greedy match starts — overlapping matches, ``match_num`` still
    1-based in start order (Trino's sequential numbering);
    ``"first:X"`` / ``"last:X"`` (Trino ``SKIP TO FIRST/LAST X``)
    resume AT the first/last row the match classified as symbol X —
    that row is re-enterable by the next match. Per Trino's runtime
    rules, skipping to the match's own FIRST row raises (infinite
    loop), and so does a match containing no X row.

    ``with_unmatched=True`` (Trino ``ALL ROWS PER MATCH WITH
    UNMATCHED ROWS``, r8) additionally emits every row belonging to
    NO match, with NULL ``match_num``/``classifier``/measures —
    requires ``all_rows`` and the default ``past_last`` skip (matches
    are disjoint there, so "unmatched" is well-defined; Trino imposes
    the same restriction).

    ``show_empty=True`` (Trino ``ALL ROWS PER MATCH SHOW EMPTY
    MATCHES`` — Trino's DEFAULT for ALL ROWS, r8) emits one row per
    EMPTY match (a zero-row match of an empty-matchable pattern like
    ``A*`` at a position where no longer match starts): the input row
    AT which the empty match occurred, a real ``match_num`` (empty
    matches consume sequential numbers either way — OMIT leaves
    numbering gaps, as Trino), NULL ``classifier``, and each measure
    evaluated over the zero-row slice (the callable must accept an
    empty frame; a zero-length vector result becomes NULL).
    ``with_unmatched`` implies showing empty matches (Trino's three
    ALL-ROWS options are alternatives; WITH UNMATCHED ROWS shows
    every input row exactly once — empty-match rows under their
    match number, not duplicated as unmatched). Regardless of skip
    mode, the scan resumes one row after an empty match (nothing was
    consumed; SKIP TO FIRST/LAST X has no X row to land on).
    """
    if with_unmatched and (not all_rows or after_match != "past_last"):
        raise ValueError(
            "with_unmatched requires all_rows=True and the default "
            "past_last skip mode (Trino's own restriction)")
    if show_empty and not all_rows:
        raise ValueError("show_empty requires all_rows=True (ONE ROW "
                         "PER MATCH always includes empty matches)")
    show_empty = show_empty or with_unmatched
    skip_sym = None
    if after_match.startswith(("first:", "last:")):
        mode, _, skip_sym = after_match.partition(":")
        after_match = mode
        # One letter = SKIP TO a pattern variable; several = SKIP TO a
        # SUBSET union variable (the target row is the first/last row
        # mapped to ANY member letter — Trino's union-variable rule).
        if not re.fullmatch(r"[A-Z]+", skip_sym):
            raise ValueError(
                f"after_match skip symbol {skip_sym!r}: uppercase "
                "letters only")
    if after_match not in ("past_last", "next_row", "first", "last"):
        raise ValueError(f"after_match {after_match!r}: 'past_last', "
                         "'next_row', 'first:X' or 'last:X'")
    pat = pattern.replace(" ", "")
    if not _PATTERN_OK_RE.match(pat.replace("{-", "(").replace("-}", ")")):
        raise ValueError(
            f"pattern {pattern!r}: only A-Z symbols with regex "
            "quantifiers/groups/alternation, ^/$ anchors and {- -} "
            "exclusions are supported")
    for name, _ in symbols:
        if not re.fullmatch(r"[A-Z]", name):
            raise ValueError(f"symbol {name!r}: must be one uppercase letter")
    # Trino output exclusions {- X -} (r8): matched as named groups;
    # their rows stay part of the match (numbering, measures, skip
    # positions all see them) but are dropped from ALL-ROWS output.
    pat, exc_names = _translate_exclusions(pat)
    if exc_names:
        # The regex module's Match.spans(name) records EVERY repetition
        # of a named group — required for quantified/nested-in-group
        # exclusions. Identical matching semantics (leftmost-greedy
        # backtracking) for this symbol/quantifier alphabet.
        import regex as _rx
        compiled = _rx.compile(pat)
    else:
        compiled = re.compile(pat)
    measures = measures or {}

    sym_col = F.lit(_NO_SYMBOL)
    for name, cond in reversed(symbols):
        sym_col = F.when(cond, F.lit(name)).otherwise(sym_col)

    order_names, order_cols = order_sort_cols(order_by)
    classified = df.withColumn("_sym", sym_col)
    if used_columns is not None:
        keep = list(dict.fromkeys(
            [*partition_by, *order_names, *used_columns, "_sym"]))
        classified = classified.select(*keep)
    if all_rows:
        row_cols = [c for c in classified.columns if c != "_sym"]
        out_schema = ", ".join(
            [f"{c} {classified.schema[c].dataType.simpleString()}"
             for c in row_cols]
            + ["match_num bigint", "classifier string"]
            + ([measure_schema] if measure_schema else []))
        cols = row_cols + ["match_num", "classifier"] + list(measures)
    else:
        out_schema = ", ".join(
            [f"{c} {classified.schema[c].dataType.simpleString()}"
             for c in partition_by]
            + ["match_num bigint", "matched string"]
            + ([measure_schema] if measure_schema else []))
        cols = partition_by + ["match_num", "matched"] + list(measures)

    def matches(s: str):
        """Match iterator per AFTER MATCH SKIP mode. ``next_row``
        restarts the search one past each match's START (not end):
        because ``search`` returns the leftmost match at-or-after the
        restart point, this enumerates exactly the positions where an
        anchored greedy match begins — Trino's overlapping-match
        semantics. ``first``/``last`` restart AT the first/last row
        classified as the skip symbol (Trino SKIP TO FIRST/LAST X),
        with Trino's own runtime errors for the two non-advancing
        cases. Empty matches: Python's scan yields one wherever an
        empty-matchable pattern finds nothing longer — kept (they are
        real matches with real numbers), EXCEPT at the end-of-string
        position, which corresponds to no input row; after an empty
        match every mode resumes at the next row (nothing consumed)."""
        if after_match == "past_last":
            for m in compiled.finditer(s):
                if m.start() == m.end() == len(s):
                    continue
                yield m
            return
        pos = 0
        while True:
            m = compiled.search(s, pos)
            if m is None:
                return
            if m.start() == m.end():
                if m.start() == len(s):
                    return
                yield m
                pos = m.start() + 1
                continue
            yield m
            if after_match == "next_row":
                pos = m.start() + 1
                continue
            g = m.group(0)
            if len(skip_sym) == 1:
                idx = (g.find(skip_sym) if after_match == "first"
                       else g.rfind(skip_sym))
            else:   # SUBSET target: first/last row mapped to ANY member
                hits = [i for i in (g.find(c) if after_match == "first"
                                    else g.rfind(c) for c in skip_sym)
                        if i >= 0]
                idx = ((min(hits) if after_match == "first" else max(hits))
                       if hits else -1)
            if idx < 0:
                raise ValueError(
                    f"AFTER MATCH SKIP TO {after_match.upper()} "
                    f"{skip_sym}: the match {g!r} contains no "
                    f"{skip_sym} row")
            if idx == 0:
                raise ValueError(
                    f"AFTER MATCH SKIP TO {after_match.upper()} "
                    f"{skip_sym}: cannot skip to the first row of the "
                    "match (infinite loop)")
            pos = m.start() + idx

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        bounds = _group_bounds(pdf, partition_by)
        sym_all = "".join(pdf["_sym"])
        if all_rows:
            import numpy as np

            used = np.zeros(len(pdf), dtype=bool)
            # ONE output frame per PARTITION (r8 flattened the
            # per-match chunks to per-group lists — 93 s -> ~3 s at
            # sf0.1 on the C* key; r15 flattens the per-group frames
            # to absolute positions over ``pdf`` — the groupby frames
            # and per-group concat were ~75% of the remaining walk).
            pos_l: list[int] = []
            mn_l: list = []
            cls_l: list = []
            meas_l: dict[str, list] = {a: [] for a in measures}
            empty_sl = pdf.iloc[0:0]
            for ga, gb in zip(bounds[:-1], bounds[1:]):
                s = sym_all[ga:gb]
                for i, m in enumerate(matches(s), start=1):
                    if m.start() == m.end():
                        # Empty match: numbered either way; emitted
                        # only under SHOW EMPTY MATCHES — the row AT
                        # the match position, NULL classifier,
                        # measures over the zero-row slice.
                        if not show_empty:
                            continue
                        used[ga + m.start()] = True
                        pos_l.append(ga + m.start())
                        mn_l.append(i)
                        cls_l.append(None)
                        for alias, fn in measures.items():
                            v = fn(empty_sl, m)
                            if (hasattr(v, "__len__")
                                    and not isinstance(v, str)):
                                v = list(v)[0] if len(v) else None
                            meas_l[alias].append(v)
                        continue
                    used[ga + m.start():ga + m.end()] = True
                    sl = _LazyRows(pdf, ga + m.start(), ga + m.end())
                    rel = list(range(m.end() - m.start()))
                    if exc_names:
                        # Exclusions drop OUTPUT rows only — measures
                        # below still see the full match; the kept
                        # rows retain their RUNNING prefix values.
                        dropped = set()
                        for nm in exc_names:
                            for a, b in m.spans(nm):
                                dropped.update(
                                    range(a - m.start(), b - m.start()))
                        if dropped:
                            rel = [k for k in rel if k not in dropped]
                    pos_l.extend(k + ga + m.start() for k in rel)
                    mn_l.extend([i] * len(rel))
                    gtxt = m.group(0)
                    cls_l.extend(gtxt[k] for k in rel)
                    for alias, fn in measures.items():
                        v = fn(sl, m)   # vector (RUNNING) or scalar (FINAL)
                        if hasattr(v, "__len__") and not isinstance(v, str):
                            v = list(v)
                            meas_l[alias].extend(v[k] for k in rel)
                        else:
                            meas_l[alias].extend([v] * len(rel))
            parts = []
            if pos_l:
                chunk = pdf.iloc[pos_l][row_cols].copy()
                chunk["match_num"] = mn_l
                chunk["classifier"] = cls_l
                for alias in measures:
                    chunk[alias] = meas_l[alias]
                parts.append(chunk)
            if with_unmatched and not used.all():
                rest = pdf.iloc[~used][row_cols].copy()
                rest["match_num"] = None
                rest["classifier"] = None
                for alias in measures:
                    rest[alias] = None
                parts.append(rest)
            if not parts:
                return pd.DataFrame(columns=cols)
            return pd.concat(parts, ignore_index=True)
        rows = []
        kvals = [pdf[c].to_numpy() for c in partition_by]
        for ga, gb in zip(bounds[:-1], bounds[1:]):
            key = tuple(arr[ga] for arr in kvals)
            s = sym_all[ga:gb]
            for i, m in enumerate(matches(s), start=1):
                chunk = _LazyRows(pdf, ga + m.start(), ga + m.end())
                rows.append([*key, i, m.group(0)]
                            + [fn(chunk, m) for fn in measures.values()])
        return pd.DataFrame(rows, columns=cols)

    def run(batches):
        import numpy as np

        buf: pd.DataFrame | None = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # An Arrow batch can split a group: hold the trailing group
            # back until the key changes (rows arrive key-sorted).
            # NaN-aware equality: pandas NaN == NaN is False, so a
            # NULL-key group straddling a batch boundary would
            # otherwise be emitted twice as separate fragments.
            last = pdf[partition_by].iloc[-1].to_numpy()
            keys = pdf[partition_by]
            eq = ((keys == last) | (keys.isna() & pd.isna(last))).all(axis=1)
            brk = np.nonzero(~eq.to_numpy())[0]
            cut = int(brk[-1]) + 1 if len(brk) else 0
            head, buf = pdf.iloc[:cut], pdf.iloc[cut:]
            if len(head):
                yield emit(head)
        if buf is not None and len(buf):
            yield emit(buf)

    return (
        classified.repartition(*partition_by)
        .sortWithinPartitions(*[F.col(c) for c in partition_by],
                              *order_cols)
        .mapInPandas(run, out_schema)
    )


@query(
    "q_events_pattern",
    oracle="""
    WITH sym AS (
        SELECT user_id,
               string_agg(CASE event_type WHEN 'view' THEN 'V'
                          WHEN 'click' THEN 'C'
                          WHEN 'purchase' THEN 'P' ELSE '.' END,
                          '' ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    ), matches AS (
        SELECT user_id,
               unnest(regexp_extract_all(s, 'VC+P')) AS matched,
               generate_subscripts(regexp_extract_all(s, 'VC+P'), 1)
                   AS match_num
        FROM sym
    )
    SELECT user_id, CAST(match_num AS BIGINT) AS match_num, matched,
           CAST(length(matched) - 2 AS BIGINT) AS n_clicks
    FROM matches
    """,
    tags=("pattern", "events"),
)
def q_events_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern funnel: per user in time order, every non-overlapping
    ``view click+ purchase`` run (ONE ROW PER MATCH, AFTER MATCH SKIP
    PAST LAST ROW, greedy) — the MATCH_RECOGNIZE query shape Trino users
    write for conversion analysis, as the match_recognize operator.

    The oracle replays the exact semantics in DuckDB: the classified
    symbol string per user (same (ts, event_id) order), RE2
    regexp_extract_all for the leftmost-first non-overlapping greedy
    matches — proving the operator against an independent regex engine.
    """
    e = t(spark, sf_dir, "events")
    return match_recognize(
        e,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        symbols=[("V", F.col("event_type") == "view"),
                 ("C", F.col("event_type") == "click"),
                 ("P", F.col("event_type") == "purchase")],
        pattern="VC+P",
        measures={"n_clicks": lambda chunk, m: int(m.group(0).count("C"))},
        measure_schema="n_clicks bigint",
        used_columns=[],
    )


@query(
    "q_events_pattern_rows",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), sym AS (
        SELECT user_id,
               string_agg(CASE event_type WHEN 'view' THEN 'V'
                          WHEN 'click' THEN 'C'
                          WHEN 'purchase' THEN 'P' ELSE '.' END,
                          '' ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    ), m AS (
        SELECT user_id,
               unnest(regexp_extract_all(s, 'VC+P')) AS mstr,
               generate_subscripts(regexp_extract_all(s, 'VC+P'), 1) AS k
        FROM sym
    ), g AS (
        SELECT user_id,
               unnest(str_split_regex(s, 'VC+P')) AS gap,
               generate_subscripts(str_split_regex(s, 'VC+P'), 1) AS gi
        FROM sym
    ), gcum AS (
        SELECT user_id, gi,
               sum(length(gap)) OVER (PARTITION BY user_id
                                      ORDER BY gi) AS cg
        FROM g
    ), mcum AS (
        SELECT user_id, k,
               sum(length(mstr)) OVER (PARTITION BY user_id
                                       ORDER BY k) AS cm
        FROM m
    ), starts AS (
        SELECT m.user_id, m.k, m.mstr,
               gcum.cg + coalesce(mcum.cm, 0) + 1 AS start
        FROM m
        JOIN gcum ON gcum.user_id = m.user_id AND gcum.gi = m.k
        LEFT JOIN mcum ON mcum.user_id = m.user_id AND mcum.k = m.k - 1
    ), rows_ AS (
        SELECT s.user_id, s.k AS match_num,
               s.start + u.i - 1 AS rn,
               substring(s.mstr, CAST(u.i AS INT), 1) AS classifier
        FROM starts s,
             unnest(generate_series(1, length(s.mstr))) AS u(i)
    )
    SELECT r.user_id, o.event_id,
           CAST(r.match_num AS BIGINT) AS match_num, r.classifier
    FROM rows_ r
    JOIN ordered o ON o.user_id = r.user_id AND o.rn = r.rn
    """,
    tags=("pattern", "events"),
)
def q_events_pattern_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL ROWS PER MATCH (r7): the same funnel pattern as
    q_events_pattern, but emitting every MATCHED row with its
    ``match_num`` and per-row ``classifier`` symbol — Trino's ALL ROWS
    PER MATCH shape (empty matches omitted).

    The oracle reconstructs per-row match membership in DuckDB from
    regex PRIMITIVES alone: ``regexp_extract_all`` gives the matched
    substrings, ``str_split_regex`` the gaps between them, and two
    cumulative-length windows recover each match's 1-based start
    offset in the symbol string; positions then join back to rows via
    the identically-ordered row_number. An independent-engine replay
    of the emit loop, row for row.
    """
    e = t(spark, sf_dir, "events")
    return match_recognize(
        e,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        symbols=[("V", F.col("event_type") == "view"),
                 ("C", F.col("event_type") == "click"),
                 ("P", F.col("event_type") == "purchase")],
        pattern="VC+P",
        used_columns=[],
        all_rows=True,
    ).select("user_id", "event_id", "match_num", "classifier")


@query(
    "q_events_pattern_skipnext",
    oracle="""
    WITH ordered AS (
        SELECT user_id, value,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pv,
               ts, event_id
        FROM events
    ), sym AS (
        SELECT user_id,
               string_agg(CASE WHEN pv IS NOT NULL AND value < pv THEN 'D'
                               WHEN pv IS NOT NULL AND value > pv THEN 'U'
                               ELSE '.' END,
                          '' ORDER BY ts, event_id) AS s
        FROM ordered GROUP BY user_id
    ), anchored AS (
        SELECT user_id, pos,
               regexp_extract(substring(s, CAST(pos AS INT)), '^D+U+') AS m
        FROM sym, unnest(generate_series(1, length(s))) AS u(pos)
    )
    SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY pos) AS BIGINT) AS match_num,
           m AS matched, CAST(length(m) AS BIGINT) AS n_rows
    FROM anchored WHERE m <> ''
    """,
    tags=("pattern", "events"),
)
def q_events_pattern_skipnext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``AFTER MATCH SKIP TO NEXT ROW`` (r8): falling-then-rising value
    runs per user (the Trino-docs V-shape query), restarting the scan
    one row past each match's START — overlapping matches, the mode
    peak/valley analytics need. The D/U classification uses a lag
    column built JVM-side (the operator's documented PREV contract).

    The oracle is genuinely discriminating for overlap: SKIP TO NEXT
    ROW's match set is exactly the positions where an anchored
    leftmost-greedy match begins, so DuckDB enumerates every start
    offset with RE2 ``^D+U+`` anchored extraction — an independent
    engine replaying overlapping-match semantics position by position.
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = e.withColumn("_pv", F.lag("value").over(w))
    return match_recognize(
        e,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        symbols=[("D", F.col("value") < F.col("_pv")),
                 ("U", F.col("value") > F.col("_pv"))],
        pattern="D+U+",
        measures={"n_rows": lambda chunk, m: len(chunk)},
        measure_schema="n_rows bigint",
        used_columns=[],
        after_match="next_row",
    )


@query(
    "q_events_pattern_empty",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_c
        FROM events
    ), units AS (
        SELECT user_id, event_id, is_c, ts,
               CASE WHEN is_c = 0
                         OR coalesce(lag(is_c) OVER w, 0) = 0
                    THEN 1 ELSE 0 END AS new_unit
        FROM ordered
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, event_id, is_c, ts,
               sum(new_unit) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS match_num
        FROM units
    )
    SELECT user_id, event_id,
           CAST(match_num AS BIGINT) AS match_num,
           CASE WHEN is_c = 1 THEN 'C' END AS classifier,
           CAST(CASE WHEN is_c = 1
                THEN row_number() OVER (PARTITION BY user_id, match_num
                                        ORDER BY ts, event_id)
                ELSE 0 END AS BIGINT) AS n_run
    FROM numbered
    """,
    tags=("pattern", "events"),
)
def q_events_pattern_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALL ROWS PER MATCH SHOW EMPTY MATCHES`` (r8 — Trino's DEFAULT
    for ALL ROWS): the empty-matchable pattern ``C*`` per user in time
    order. Every maximal click run is one match (classifier 'C',
    RUNNING count(*) = 1..n); every other row hosts an EMPTY match —
    emitted with its own sequential match number, NULL classifier, and
    count 0. Every input row appears exactly once.

    The oracle replays the semantics with run-length arithmetic: a
    greedy ``C*`` scan numbers each maximal click run and each
    non-click row as one consecutive match unit per user, so
    match_num = the running count of unit starts, and RUNNING count(*)
    = row_number within the run (0 at empty-match rows) — an exact,
    regex-free derivation of the scan.
    """
    e = t(spark, sf_dir, "events")
    return match_recognize(
        e,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        symbols=[("C", F.col("event_type") == "click")],
        pattern="C*",
        measures={"n_run": lambda chunk, m:
                  list(range(1, len(chunk) + 1)) if len(chunk) else 0},
        measure_schema="n_run bigint",
        used_columns=[],
        all_rows=True,
        show_empty=True,
    ).select("user_id", "event_id", "match_num", "classifier", "n_run")
