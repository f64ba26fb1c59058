"""C11 type-lattice tests: both mapping directions, the reference's
widening mode, nested recursion, and the documented rejections.
Property-based round-trip via hypothesis over generated nested types.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from okera_trino_spark.sources.types import okera_type_to_spark, spark_type_to_okera


@pytest.mark.parametrize("okera,expected", [
    ("BOOLEAN", T.BooleanType()),
    ("TINYINT", T.ByteType()),
    ("SMALLINT", T.ShortType()),
    ("INT", T.IntegerType()),
    ("BIGINT", T.LongType()),
    ("FLOAT", T.FloatType()),
    ("DOUBLE", T.DoubleType()),
    ("STRING", T.StringType()),
    ("VARCHAR(20)", T.StringType()),
    ("CHAR(5)", T.StringType()),
    ("BINARY", T.BinaryType()),
    ("DATE", T.DateType()),
    ("TIMESTAMP_NANOS", T.TimestampType()),
    ("DECIMAL(12,2)", T.DecimalType(12, 2)),
    ("ARRAY<INT>", T.ArrayType(T.IntegerType(), True)),
    ("MAP<STRING,DOUBLE>", T.MapType(T.StringType(), T.DoubleType(), True)),
])
def test_okera_to_spark(okera, expected):
    assert okera_type_to_spark(okera) == expected


def test_reference_widening_mode():
    """RecordServiceMetadata.java:733-738: TINYINT/SMALLINT→INT32,
    FLOAT→DOUBLE, BINARY→string."""
    assert okera_type_to_spark("TINYINT", widen_like_reference=True) == T.IntegerType()
    assert okera_type_to_spark("SMALLINT", widen_like_reference=True) == T.IntegerType()
    assert okera_type_to_spark("FLOAT", widen_like_reference=True) == T.DoubleType()
    assert okera_type_to_spark("BINARY", widen_like_reference=True) == T.StringType()
    # widening recurses into nested types
    assert okera_type_to_spark("ARRAY<FLOAT>", widen_like_reference=True) == \
        T.ArrayType(T.DoubleType(), True)


def test_nested_struct_with_lowercased_names():
    got = okera_type_to_spark("STRUCT<Outer: ARRAY<STRUCT<Inner: INT>>, m: MAP<STRING,BIGINT>>")
    assert got == T.StructType([
        T.StructField("outer", T.ArrayType(
            T.StructType([T.StructField("inner", T.IntegerType())]), True)),
        T.StructField("m", T.MapType(T.StringType(), T.LongType(), True)),
    ])


def test_unsupported_rejected():
    with pytest.raises(ValueError, match="UNSUPPORTED"):
        okera_type_to_spark("GEOMETRY")


def test_spark_to_okera_timestamps_and_structs():
    assert spark_type_to_okera(T.TimestampType()) == "TIMESTAMP_NANOS"
    assert spark_type_to_okera(T.TimestampNTZType()) == "TIMESTAMP_NANOS"
    s = T.StructType([T.StructField("a", T.IntegerType()),
                      T.StructField("b", T.ArrayType(T.DoubleType()))])
    assert spark_type_to_okera(s) == "STRUCT<a: INT,b: ARRAY<DOUBLE>>"


def test_anonymous_struct_rejected():
    with pytest.raises(ValueError, match="anonymous"):
        spark_type_to_okera(T.StructType([T.StructField("", T.IntegerType())]))


# ---------------------------------------------------------- property-based
_leaf = st.sampled_from([
    T.BooleanType(), T.IntegerType(), T.LongType(), T.DoubleType(),
    T.StringType(), T.DateType(), T.DecimalType(10, 2),
])

_types = st.recursive(
    _leaf,
    lambda inner: st.one_of(
        inner.map(lambda t: T.ArrayType(t, True)),
        st.tuples(_leaf, inner).map(lambda kv: T.MapType(kv[0], kv[1], True)),
        st.lists(
            st.tuples(st.sampled_from(["a", "b", "c", "d"]), inner),
            min_size=1, max_size=3, unique_by=lambda kv: kv[0],
        ).map(lambda fs: T.StructType([T.StructField(n, t) for n, t in fs])),
    ),
    max_leaves=6,
)


@settings(max_examples=200, deadline=None)
@given(_types)
def test_roundtrip_spark_okera_spark(dtype):
    """spark → okera string → spark is the identity for every type the
    lattice supports (names here are already lower-case; array/map
    nullability normalizes to containsNull=True like the reference,
    RecordServiceUtil.java:207-210,302-317)."""
    assert okera_type_to_spark(spark_type_to_okera(dtype)) == dtype
