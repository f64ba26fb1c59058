"""Trino EXPLAIN statement family through the dialect front end.

A migrating Trino user's inspection workflow — ``EXPLAIN``, ``EXPLAIN
(TYPE LOGICAL|DISTRIBUTED|VALIDATE|IO)``, ``EXPLAIN ANALYZE`` — lowered
onto Spark's plan introspection (functions/trino_sql.py
execute_trino_explain). Output is engine-specific plan text, so there
is no cross-engine oracle; the contract tested here is structural:
the right plan layer appears, VALIDATE raises on bad references, the
IO summary reports the pruned column set and pushed filters, ANALYZE
actually executes and reports the measured row count, and the governed
path scopes all of it by policy.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql.utils import AnalysisException

from okera_trino_spark.functions.trino_sql import (
    TrinoSqlUnsupported,
    execute_trino,
)

Q = ("SELECT o_orderpriority, count(*) AS n FROM orders "
     "WHERE o_orderdate >= DATE '1997-01-01' GROUP BY o_orderpriority")


def test_explain_default_is_distributed_physical(spark, sf_dir):
    df = execute_trino(spark, "EXPLAIN " + Q, sf_dir)
    assert df.columns == ["Query Plan"]
    [(text,)] = df.collect()
    assert "Scan parquet" in text
    assert "Exchange" in text  # the distributed boundary Trino fragments at


def test_explain_type_logical(spark, sf_dir):
    [(text,)] = execute_trino(
        spark, "EXPLAIN (TYPE LOGICAL) " + Q, sf_dir).collect()
    assert "Aggregate" in text
    assert "WholeStageCodegen" not in text  # logical, not physical


def test_explain_type_validate_true(spark, sf_dir):
    rows = execute_trino(
        spark, "EXPLAIN (TYPE VALIDATE) " + Q, sf_dir).collect()
    assert [r["Valid"] for r in rows] == [True]


def test_explain_type_validate_raises_on_bad_column(spark, sf_dir):
    with pytest.raises(AnalysisException):
        execute_trino(
            spark, "EXPLAIN (TYPE VALIDATE) SELECT nope FROM orders",
            sf_dir).collect()


def test_explain_type_io_reports_pruning_and_pushdown(spark, sf_dir):
    [(text,)] = execute_trino(
        spark, "EXPLAIN (TYPE IO, FORMAT JSON) " + Q, sf_dir).collect()
    doc = json.loads(text)
    infos = doc["inputTableColumnInfos"]
    assert len(infos) == 1
    info = infos[0]
    assert info["table"]["schemaTable"]["table"] == "orders"
    # projection pruning: only the two referenced columns are read
    assert sorted(info["columns"]) == ["o_orderdate", "o_orderpriority"]
    # the date predicate reached the scan, with its comma-carrying
    # rendering intact (depth-0 split)
    assert any(f.startswith("GreaterThanOrEqual(o_orderdate,")
               for f in info["pushedFilters"])


def test_explain_analyze_executes_and_counts(spark, sf_dir):
    [(text,)] = execute_trino(spark, "EXPLAIN ANALYZE " + Q,
                              sf_dir).collect()
    footer = text.splitlines()[-1]
    n = execute_trino(spark, Q, sf_dir).count()
    assert f"output rows {n}," in footer


@pytest.mark.parametrize("bad,frag", [
    ("EXPLAIN (FORMAT GRAPHVIZ) ", "GRAPHVIZ"),
    ("EXPLAIN (TYPE DISTRIBUTED) ANALYZE ", "ANALYZE takes no"),
    ("EXPLAIN (TYPE LOGICAL, FORMAT JSON) ", "FORMAT JSON"),
    ("EXPLAIN (TYPE FRAGMENTED) ", "EXPLAIN option"),
])
def test_explain_named_refusals(spark, sf_dir, bad, frag):
    with pytest.raises(TrinoSqlUnsupported, match=frag.replace("(", "\\(")):
        execute_trino(spark, bad + Q, sf_dir)


def test_explain_requires_statement(spark, sf_dir):
    with pytest.raises(TrinoSqlUnsupported, match="requires a statement"):
        execute_trino(spark, "EXPLAIN (TYPE VALIDATE)", sf_dir)


def test_explain_refuses_ddl_without_executing(spark, sf_dir):
    """Spark runs commands eagerly at planning, so EXPLAIN over DDL must
    refuse BEFORE the command executes — the view must not be created."""
    with pytest.raises(TrinoSqlUnsupported, match="plans commands eagerly"):
        execute_trino(
            spark,
            "EXPLAIN (TYPE VALIDATE) CREATE VIEW _explain_leak AS "
            "SELECT 1 AS x",
            sf_dir)
    assert not any(t.name == "_explain_leak"
                   for t in spark.catalog.listTables())


def test_explain_io_sees_partitioned_scans(spark, sf_dir, tmp_path):
    """A partitioned table's scan block carries a PartitionFilters line
    between Location and PushedFilters/ReadSchema; the per-block parse
    must still report the table (the old single-regex form silently
    dropped it)."""
    p = str(tmp_path / "events_part")
    (spark.range(0, 100)
     .selectExpr("id", "id % 3 AS day", "id * 2 AS v")
     .write.partitionBy("day").mode("overwrite").parquet(p))
    spark.read.parquet(p).createOrReplaceTempView("events_part")
    [(text,)] = execute_trino(
        spark,
        "EXPLAIN (TYPE IO, FORMAT JSON) "
        "SELECT e.v FROM events_part e JOIN nation n "
        "ON e.id = n.n_nationkey WHERE e.day = 1 AND e.v > 10",
        sf_dir).collect()
    infos = json.loads(text)["inputTableColumnInfos"]
    names = sorted(i["table"]["schemaTable"]["table"] for i in infos)
    assert names == ["events_part", "nation"], infos
    part = next(i for i in infos
                if i["table"]["schemaTable"]["table"] == "events_part")
    assert "v" in part["columns"], part
    assert any("GreaterThan(v" in f for f in part["pushedFilters"]), part


def test_explain_io_handles_nested_schema_and_csv(spark, sf_dir, tmp_path):
    """Nested ReadSchema types must not break column extraction (the
    old '<'-naive parse reported inner fields as top-level columns and
    dropped later ones), and non-parquet file sources must appear."""
    np = str(tmp_path / "nested")
    (spark.range(0, 10)
     .selectExpr("named_struct('w', id, 'h', id + 1) AS meta",
                 "id AS doc_id")
     .write.mode("overwrite").parquet(np))
    spark.read.parquet(np).createOrReplaceTempView("nested_t")
    [(text,)] = execute_trino(
        spark, "EXPLAIN (TYPE IO, FORMAT JSON) "
               "SELECT meta.w, doc_id FROM nested_t", sf_dir).collect()
    infos = json.loads(text)["inputTableColumnInfos"]
    cols = infos[0]["columns"]
    assert "doc_id" in cols, infos
    assert "h" not in cols, infos  # nested field never a top-level col
    cp = str(tmp_path / "csvsrc")
    (spark.range(0, 10).selectExpr("id", "id * 3 AS x")
     .write.mode("overwrite").option("header", True).csv(cp))
    (spark.read.option("header", True).option("inferSchema", True)
     .csv(cp).createOrReplaceTempView("csv_t"))
    [(text,)] = execute_trino(
        spark, "EXPLAIN (TYPE IO, FORMAT JSON) SELECT x FROM csv_t",
        sf_dir).collect()
    infos = json.loads(text)["inputTableColumnInfos"]
    assert len(infos) == 1 and "x" in infos[0]["columns"], infos


def test_explain_io_dedupes_self_join_scans(spark, sf_dir):
    """A self-join scans the same table with the same column set twice;
    the IO summary reports it once."""
    [(text,)] = execute_trino(
        spark,
        "EXPLAIN (TYPE IO, FORMAT JSON) "
        "SELECT a.n_nationkey FROM nation a JOIN nation b "
        "ON a.n_nationkey = b.n_nationkey",
        sf_dir).collect()
    infos = json.loads(text)["inputTableColumnInfos"]
    names = [i["table"]["schemaTable"]["table"] for i in infos]
    assert names.count("nation") == 1


def test_explain_grammar_fuzz_never_crashes_python(spark, sf_dir):
    """Statement-level contract fuzz: ANY combination of EXPLAIN
    options, ANALYZE, and an inner statement either returns a DataFrame
    or raises a NAMED error (TrinoSqlUnsupported / Spark analysis or
    parse error) — never a bare Python exception — and never mutates
    catalog state (the DDL gate)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import DataFrame
    from pyspark.sql.utils import CapturedException

    option = st.sampled_from(
        ["TYPE LOGICAL", "TYPE DISTRIBUTED", "TYPE VALIDATE", "TYPE IO",
         "FORMAT TEXT", "FORMAT JSON", "FORMAT GRAPHVIZ", "TYPE BOGUS",
         "", "X Y Z"])
    inner = st.sampled_from(
        ["SELECT 1 AS x", "SELECT n_name FROM nation",
         "SELECT nope FROM orders", "",
         "CREATE VIEW _fuzz_leak AS SELECT 1 AS x",
         "DROP VIEW nation"])

    @settings(max_examples=40, deadline=None)
    @given(st.lists(option, max_size=3), st.booleans(), inner)
    def check(opts, analyze, stmt):
        sql = "EXPLAIN "
        if opts:
            sql += "(" + ", ".join(opts) + ") "
        if analyze:
            sql += "ANALYZE "
        sql += stmt
        try:
            out = execute_trino(spark, sql, sf_dir)
            assert isinstance(out, DataFrame)
        except (TrinoSqlUnsupported, CapturedException):
            pass
        assert not any(t.name == "_fuzz_leak"
                       for t in spark.catalog.listTables())

    check()


def test_governed_explain_is_policy_scoped(spark, sf_dir):
    """EXPLAIN through GovernedCatalog.execute plans over the caller's
    governed views: a column the policy hides fails VALIDATE, and the
    IO summary never lists it."""
    from okera_trino_spark.sources.catalog import (
        GovernedCatalog,
        TablePolicy,
    )
    cat = GovernedCatalog(spark, sf_dir)
    cat.set_policy("eve", "orders", TablePolicy(
        allowed_columns=["o_orderkey", "o_orderpriority"]))
    df = cat.execute("EXPLAIN SELECT o_orderpriority FROM orders",
                     user="eve", dialect="trino")
    assert df.columns == ["Query Plan"]
    with pytest.raises(AnalysisException):
        cat.execute(
            "EXPLAIN (TYPE VALIDATE) SELECT o_totalprice FROM orders",
            user="eve", dialect="trino").collect()
    # the statement is audited like any other submission
    assert any(r.sql.startswith("EXPLAIN") for r in cat.audit_log)


def test_explain_parenthesized_query_is_not_options(spark, sf_dir):
    """A leading '(' that opens a parenthesized QUERY must not be
    parsed as an options list (r12, ADVICE): EXPLAIN (SELECT 1) and
    EXPLAIN ((SELECT ...) UNION ALL ...) are legitimate Trino
    statements."""
    for sql in ("EXPLAIN (SELECT 1 AS x)",
                "EXPLAIN ((SELECT n_name AS s FROM nation) "
                "UNION ALL (SELECT r_name AS s FROM region))",
                # whitespace BETWEEN opening parens (r12 ADVICE #2):
                # the peek must step past any '('+space sequence
                "EXPLAIN (( (SELECT n_name AS s FROM nation)) )",
                "EXPLAIN ( ( SELECT 1 AS x ) )"):
        df = execute_trino(spark, sql, sf_dir)
        assert df.columns == ["Query Plan"]
    # a real options list still parses as options
    df = execute_trino(
        spark, "EXPLAIN (TYPE VALIDATE) SELECT 1 AS x", sf_dir)
    assert df.collect()[0].Valid is True


def test_io_block_regex_keeps_final_unterminated_line():
    """The scan-block regex must not drop a final detail line that
    lacks a trailing newline (r12, ADVICE) — ReadSchema is typically
    last in the block."""
    from okera_trino_spark.functions.trino_sql import _IO_BLOCK_RE

    plan = ("(1) Scan parquet [n_name]\n"
            "Location: InMemoryFileIndex [file:/x/nation.parquet]\n"
            "ReadSchema: struct<n_name:string>")
    (block,) = _IO_BLOCK_RE.findall(plan)
    assert "ReadSchema: struct<n_name:string>" in block


def test_split_filters_survives_literal_punctuation():
    """Filter splitting keys on ')  ,  Name(' boundaries, not bare
    depth-0 commas, so unquoted literals carrying commas or stray
    parens do not shatter into bogus entries (r12, ADVICE)."""
    from okera_trino_spark.functions.trino_sql import _split_filters

    assert _split_filters(
        "IsNotNull(a), EqualTo(name,Smith, Jr.), "
        "GreaterThan(b,3)") == [
        "IsNotNull(a)", "EqualTo(name,Smith, Jr.)", "GreaterThan(b,3)"]
    # stray ')' inside a literal cannot take depth negative
    assert _split_filters("EqualTo(name,Smi)th), In(b, [1,2])") == [
        "EqualTo(name,Smi)th)", "In(b, [1,2])"]
