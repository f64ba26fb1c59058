"""Okera type-string ↔ Spark type mapping — SURVEY.md §1.2 / C11.

Mirrors both directions of the reference's type lattice:

- Okera → engine types (RecordServiceMetadata.java:723-765), including
  the reference's *widenings* (TINYINT/SMALLINT → INT32, FLOAT →
  DOUBLE, BINARY surfaced as string) — reproduced only when
  ``widen_like_reference=True``; by default the engine keeps the
  faithful narrow Spark types, which is strictly more precise.
- engine → Okera type strings for view DDL (``toOkeraTypeString``,
  RecordServiceMetadata.java:632-718): TIMESTAMP/TIMESTAMP_TZ →
  TIMESTAMP_NANOS (:669-677), ROW → ``STRUCT<name: type, …>`` with
  anonymous fields rejected (:691-714), ARRAY/MAP recursion (:683-690).

Timestamp note: the reference *declares* TIMESTAMP_NANOS but decodes at
micro precision, dropping the 4 nano bytes
(RecordServicePageSource.java:353-366). Spark's TimestampType is
µs-native, so the engine's effective precision equals the reference's.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_DECIMAL_RE = re.compile(r"^DECIMAL\((\d+),\s*(\d+)\)$", re.IGNORECASE)
_VARCHAR_RE = re.compile(r"^(VARCHAR|CHAR)\((\d+)\)$", re.IGNORECASE)
_ARRAY_RE = re.compile(r"^ARRAY<(.+)>$", re.IGNORECASE | re.DOTALL)
_MAP_RE = re.compile(r"^MAP<(.+)>$", re.IGNORECASE | re.DOTALL)
_STRUCT_RE = re.compile(r"^(?:STRUCT|RECORD)<(.+)>$", re.IGNORECASE | re.DOTALL)

_SIMPLE: dict[str, T.DataType] = {
    "BOOLEAN": T.BooleanType(),
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "STRING": T.StringType(),
    "VARCHAR": T.StringType(),
    "BINARY": T.BinaryType(),
    "DATE": T.DateType(),
    "TIMESTAMP_NANOS": T.TimestampType(),  # µs effective, like the reference
    "TIMESTAMP": T.TimestampType(),
}

#: The reference's widenings (RecordServiceMetadata.java:733-738).
_REFERENCE_WIDENING: dict[str, T.DataType] = {
    "TINYINT": T.IntegerType(),
    "SMALLINT": T.IntegerType(),
    "FLOAT": T.DoubleType(),
    "BINARY": T.StringType(),
}


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside any <...> or (...) nesting — parens
    matter because DECIMAL(p,s) carries a comma."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def okera_type_to_spark(type_str: str, widen_like_reference: bool = False) -> T.DataType:
    """Okera catalog type string → Spark DataType
    (RecordServiceMetadata.java:723-765 lattice; UNSUPPORTED → error,
    :761-764)."""
    s = type_str.strip()
    upper = s.upper()
    if widen_like_reference and upper in _REFERENCE_WIDENING:
        return _REFERENCE_WIDENING[upper]
    if upper in _SIMPLE:
        return _SIMPLE[upper]
    m = _DECIMAL_RE.match(s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = _VARCHAR_RE.match(s)
    if m:
        # length-carrying VARCHAR(n)/CHAR(n) (:729,739): Spark stores
        # these as StringType with char/varchar metadata; plain
        # StringType is the engine-facing runtime type.
        return T.StringType()
    m = _ARRAY_RE.match(s)
    if m:
        return T.ArrayType(okera_type_to_spark(m.group(1), widen_like_reference),
                           containsNull=True)
    m = _MAP_RE.match(s)
    if m:
        kv = _split_top_level(m.group(1))
        if len(kv) != 2:
            raise ValueError(f"bad MAP type: {type_str!r}")
        return T.MapType(okera_type_to_spark(kv[0], widen_like_reference),
                         okera_type_to_spark(kv[1], widen_like_reference),
                         valueContainsNull=True)
    m = _STRUCT_RE.match(s)
    if m:
        fields = []
        for part in _split_top_level(m.group(1)):
            name, _, ftype = part.partition(":")
            if not ftype:
                raise ValueError(f"struct field needs name: type — got {part!r}")
            # field names lower-cased like the reference (:740-749)
            fields.append(T.StructField(name.strip().lower(),
                                        okera_type_to_spark(ftype, widen_like_reference)))
        return T.StructType(fields)
    raise ValueError(f"UNSUPPORTED type: {type_str!r}")


def spark_type_to_okera(dtype: T.DataType) -> str:
    """Spark DataType → Okera type string for view DDL
    (toOkeraTypeString, RecordServiceMetadata.java:632-718)."""
    if isinstance(dtype, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dtype, T.ByteType):
        return "TINYINT"
    if isinstance(dtype, T.ShortType):
        return "SMALLINT"
    if isinstance(dtype, T.IntegerType):
        return "INT"
    if isinstance(dtype, T.LongType):
        return "BIGINT"
    if isinstance(dtype, T.FloatType):
        return "FLOAT"
    if isinstance(dtype, T.DoubleType):
        return "DOUBLE"
    if isinstance(dtype, T.StringType):
        return "STRING"
    if isinstance(dtype, T.BinaryType):
        return "BINARY"
    if isinstance(dtype, T.DateType):
        return "DATE"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # TIMESTAMP / TIMESTAMP_TZ → TIMESTAMP_NANOS (:669-677)
        return "TIMESTAMP_NANOS"
    if isinstance(dtype, T.DecimalType):
        return f"DECIMAL({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.ArrayType):
        return f"ARRAY<{spark_type_to_okera(dtype.elementType)}>"
    if isinstance(dtype, T.MapType):
        return (f"MAP<{spark_type_to_okera(dtype.keyType)},"
                f"{spark_type_to_okera(dtype.valueType)}>")
    if isinstance(dtype, T.StructType):
        # anonymous rows rejected (:691-714)
        for f in dtype.fields:
            if not f.name:
                raise ValueError("anonymous struct fields are not supported")
        inner = ",".join(f"{f.name}: {spark_type_to_okera(f.dataType)}"
                         for f in dtype.fields)
        return f"STRUCT<{inner}>"
    raise ValueError(f"unsupported Spark type: {dtype!r}")


def spark_type_to_trino(dtype: T.DataType) -> str:
    """Spark DataType → the Trino type string the engine would show in
    ``information_schema.columns.data_type`` for this connector's
    columns (the engine-side rendering of the C11 mapping;
    RecordServiceMetadata.java:632-718 is the connector half).
    Lowercase, parameterized forms per Trino convention."""
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, T.ByteType):
        return "tinyint"
    if isinstance(dtype, T.ShortType):
        return "smallint"
    if isinstance(dtype, T.IntegerType):
        return "integer"
    if isinstance(dtype, T.LongType):
        return "bigint"
    if isinstance(dtype, T.FloatType):
        return "real"
    if isinstance(dtype, T.DoubleType):
        return "double"
    if isinstance(dtype, T.StringType):
        return "varchar"
    if isinstance(dtype, T.BinaryType):
        return "varbinary"
    if isinstance(dtype, T.DateType):
        return "date"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # Trino's default timestamp precision for this surface.
        return "timestamp(3)"
    if isinstance(dtype, T.DecimalType):
        return f"decimal({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.ArrayType):
        return f"array({spark_type_to_trino(dtype.elementType)})"
    if isinstance(dtype, T.MapType):
        return (f"map({spark_type_to_trino(dtype.keyType)}, "
                f"{spark_type_to_trino(dtype.valueType)})")
    if isinstance(dtype, T.StructType):
        inner = ", ".join(f"{f.name} {spark_type_to_trino(f.dataType)}"
                          for f in dtype.fields)
        return f"row({inner})"
    raise ValueError(f"unsupported Spark type: {dtype!r}")
