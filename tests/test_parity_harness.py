"""Self-tests of the driver-strict local parity harness (tests/parity.py):
each test seeds the exact defect class that slipped past a weaker local
gate in a prior round (r7 GROUPS, r8 breadth2/3, r9 listagg_trunc) and
asserts the hardened gate now red-flags it.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.parity import (
    _canon_value,
    assert_driver_canonicalizable,
    assert_driver_comparable_schema,
    assert_dtype_kinds_match,
    compare_frames,
)


def test_canon_tags_bytes_distinct_from_hex_str():
    """r9 listagg_trunc red: byte-identical md5 digests, bytes on the
    Spark side vs hex VARCHAR on the oracle side — must NOT canon-equal."""
    digest = bytes.fromhex("c0dba09f00000000000000000000dead")
    assert _canon_value(digest) != _canon_value(digest.hex())
    assert _canon_value(digest) == f"b:{digest.hex()}"


def test_compare_frames_rejects_bytes_vs_hex_str():
    digest = bytes.fromhex("deadbeef")
    spark_pdf = pd.DataFrame({"h": [digest]})
    oracle_pdf = pd.DataFrame({"h": [digest.hex()]})
    with pytest.raises(AssertionError):
        compare_frames(spark_pdf, oracle_pdf, name="bytes-drift")


def test_canon_tags_float_distinct_from_int():
    """r8 breadth2 red: int64 126 vs float64 126.0."""
    assert _canon_value(126) != _canon_value(126.0)


def test_dtype_kind_gate_flags_int_float_drift():
    with pytest.raises(AssertionError):
        assert_dtype_kinds_match(pd.DataFrame({"n": [126]}),
                                 pd.DataFrame({"n": [126.0]}),
                                 name="kind-drift")


def test_canonicalizable_gate_flags_nested_cells():
    """r8 breadth3 ERR: raw array cells crash the driver's hash sort."""
    with pytest.raises(AssertionError):
        assert_driver_canonicalizable(pd.DataFrame({"a": [[1, 2]]}),
                                      name="nested")


def test_schema_gate_flags_binary_output(spark):
    """r10 done-criterion: a seeded Trino-style md5 output (BinaryType —
    Spark's own md5 returns hex VARCHAR, so seed via unhex) must trip the
    registry-wide shape gate."""
    df = spark.sql("SELECT unhex(md5('x')) AS h")
    assert df.schema.fields[0].dataType.typeName() == "binary"
    with pytest.raises(AssertionError, match="BinaryType"):
        assert_driver_comparable_schema(df.schema, name="seeded-md5")
    # hex-rendered digests pass
    ok = spark.sql("SELECT lower(hex(md5('x'))) AS h")
    assert_driver_comparable_schema(ok.schema, name="hex-md5")


def test_schema_gate_flags_nested_output(spark):
    df = spark.sql("SELECT array(1, 2) AS a")
    with pytest.raises(AssertionError, match="array/map/struct"):
        assert_driver_comparable_schema(df.schema, name="seeded-array")
