"""GovernedCatalog unit tests — the custom layer SURVEY.md §5.3 says to
test directly: column-level authorization, row policies, session
properties (limit/sampling), view lifecycle, listings, audit log.
"""

from __future__ import annotations

import pytest

from okera_trino_spark.sources.catalog import (
    MAX_TABLES_LISTED,
    GovernedCatalog,
    TablePolicy,
)


@pytest.fixture()
def cat(spark, sf_dir):
    return GovernedCatalog(spark, sf_dir)


def test_column_authz_drops_columns_silently(cat):
    """RecordServiceMetadata.java:804: unauthorized columns vanish from
    the visible schema — no error."""
    cat.set_policy("alice", "customer", TablePolicy(
        allowed_columns=["c_custkey", "c_name"]))
    df = cat.read("customer", user="alice")
    assert df.columns == ["c_custkey", "c_name"]
    # other users see everything
    assert len(cat.read("customer", user="bob").columns) == 5


def test_row_policy_filters(cat):
    cat.set_policy("alice", "orders", TablePolicy(row_filter="o_orderstatus = 'F'"))
    got = cat.read("orders", user="alice").select("o_orderstatus").distinct().collect()
    assert [r.o_orderstatus for r in got] == ["F"]


def test_row_and_column_policy_compose(cat):
    """Row filter may reference columns the user cannot see — filter
    applies before the column prune (the reference's internal-view
    evaluation order)."""
    cat.set_policy("carol", "orders", TablePolicy(
        allowed_columns=["o_orderkey"], row_filter="o_orderstatus = 'F'"))
    df = cat.read("orders", user="carol")
    assert df.columns == ["o_orderkey"]
    assert df.count() > 0


def test_session_limit_caps_reads(cat):
    cat.props.limit = 7
    assert cat.read("lineitem").count() == 7


def test_sampled_catalog_reads_fraction(spark, sf_dir):
    """okera_sampled_* variants: byte cap → sample fraction. A 10 KB cap
    on the lineitem file must read far fewer rows than the full scan."""
    full = GovernedCatalog(spark, sf_dir).read("lineitem").count()
    sampled = GovernedCatalog(spark, sf_dir, catalog_name="okera_sampled_10kb",
                              sample_bytes=10 * 1024).read("lineitem").count()
    assert 0 < sampled < full


def test_view_lifecycle_and_errors(cat):
    cat.create_view("v1", "SELECT r_name FROM region")
    assert "v1" in cat.list_views()
    with pytest.raises(ValueError, match="already exists"):
        cat.create_view("v1", "SELECT 1")
    cat.create_view("v1", "SELECT r_regionkey FROM region", replace=True)
    assert cat.read("v1").columns == ["r_regionkey"]
    cat.drop_view("v1")
    assert cat.list_views() == []
    cat.drop_view("v1", if_exists=True)  # idempotent
    with pytest.raises(ValueError, match="no such view"):
        cat.drop_view("v1", if_exists=False)


def test_listings_capped_and_sorted(cat):
    tables = cat.list_tables()
    assert tables == sorted(tables)
    assert len(tables) <= MAX_TABLES_LISTED
    assert "information_schema" not in cat.list_schemas()


def test_table_stats_surface(cat, spark, sf_dir):
    """C13: row count + byte size + column count, stats-mode tagged."""
    st = cat.table_stats("nation")
    assert st["row_count"] == 25
    assert st["size_bytes"] > 0
    assert st["n_columns"] == 3
    assert st["stats_mode"] == "okera"


def test_audit_log_records_success_and_failure(cat):
    cat.execute("SELECT count(*) AS n FROM region").collect()
    with pytest.raises(Exception):
        cat.execute("SELECT * FROM no_such_table_xyz")
    log = cat.audit_log
    assert len(log) == 2
    ok, bad = log
    assert ok.success and ok.error is None and "region" in ok.sql
    assert not bad.success and bad.error
    assert bad.query_id == ok.query_id + 1
    assert ok.user == "root"
