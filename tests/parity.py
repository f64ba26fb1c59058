"""Order-insensitive DataFrame vs DuckDB comparison — local stand-in for
the driver's correctness gate (row count + schema-shape + value compare).

Stricter than a hash: on mismatch it reports which rows differ.

DRIVER-STRICT (r9): the external driver's pandas canonicalizer
(a) hash-sorts rows, so any unhashable cell (list/dict/ndarray — i.e.
    any raw array/map output column) crashes it with
    ``TypeError: unhashable type`` (the r8 q_trino_sql_breadth3 ERR);
(b) does NOT absorb int-vs-float drift: an int64 126 on one side and a
    float64 126.0 on the other hash differently (the r8
    q_trino_sql_breadth2 red — DuckDB HUGEINT → pandas float64).
The old local canon formatted floats with %.9g, silently absorbing (b),
which is exactly how breadth2 slipped past the local gate. This module
now enforces both rules: unhashable cells are an assertion failure, and
numeric dtype KIND (int vs float vs bool) must agree per column, with
float canon values tagged ``f:`` so mixed object columns can't absorb
the drift either.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FLOAT_REL_TOL = 1e-9
FLOAT_ABS_TOL = 1e-9

#: Cell types the driver's hash-based row sort cannot handle.
_UNHASHABLE = (list, dict, set, np.ndarray)


def assert_driver_canonicalizable(pdf: pd.DataFrame, name: str = "",
                                  side: str = "") -> None:
    """Fail if any cell would crash the driver's pandas canonicalizer
    (hash-based row sort → every cell must be hashable: no raw
    array/map/struct output columns — serialize them to strings)."""
    for col in pdf.columns:
        if pdf[col].dtype.kind != "O":
            continue
        for v in pdf[col]:
            if isinstance(v, _UNHASHABLE):
                raise AssertionError(
                    f"{name}: column {col!r} ({side}) holds unhashable "
                    f"{type(v).__name__} cells — the driver's "
                    "canonicalizer crashes on these (r8 breadth3 ERR); "
                    "serialize nested output to VARCHAR on both sides"
                )


def assert_driver_comparable_schema(schema, name: str = "") -> None:
    """Fail if a Spark schema contains output columns the driver cannot
    compare against a DuckDB oracle: Array/Map/Struct crash the pandas
    hash-sort (r8 breadth3 ERR) and Binary hashes bytes != the oracle's
    hex-VARCHAR digest even when byte-identical (r9 listagg_trunc red).
    Allowed output kinds: str, int, float, bool, date/timestamp."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

    complex_cols = [f.name for f in schema.fields
                    if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    if complex_cols:
        raise AssertionError(
            f"{name}: driver-uncanonicalizable output columns {complex_cols} "
            "(array/map/struct) — serialize to VARCHAR on both sides")
    binary_cols = [f.name for f in schema.fields
                   if isinstance(f.dataType, BinaryType)]
    if binary_cols:
        raise AssertionError(
            f"{name}: BinaryType output columns {binary_cols} — the driver "
            "hashes bytes != the oracle's hex VARCHAR (r9 listagg_trunc "
            "red); render digests to hex strings, e.g. lower(to_hex(...))")


def _kind_group(dtype) -> str:
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def assert_dtype_kinds_match(spark_pdf: pd.DataFrame,
                             oracle_pdf: pd.DataFrame,
                             name: str = "") -> None:
    """Fail on numeric dtype-kind drift (int vs float vs bool) between
    the Spark and oracle frames — the driver hashes 126 != 126.0."""
    for col in spark_pdf.columns:
        sg = _kind_group(spark_pdf[col].dtype)
        og = _kind_group(oracle_pdf[col].dtype)
        if sg != og and "other" not in (sg, og):
            raise AssertionError(
                f"{name}: column {col!r} dtype-kind drift spark={sg} "
                f"({spark_pdf[col].dtype}) vs oracle={og} "
                f"({oracle_pdf[col].dtype}) — the driver hash does not "
                "absorb this (r8 breadth2 red); CAST the oracle (DuckDB "
                "SUM/list_sum of BIGINT → HUGEINT → float64) or the "
                "Spark side so both are the same kind"
            )


def _canon_value(v):
    if isinstance(v, np.generic):  # numpy scalar → native (repr-stable)
        v = v.item()
    if v is None:
        return "<NULL>"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        # round-trip through repr at reduced precision to absorb
        # platform-level last-bit differences; the f: tag keeps float
        # 126.0 distinct from int 126 (driver-strict — see module doc)
        return f"f:{v:.9g}"
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, bytes):
        # driver-strict: the driver hashes raw bytes objects, so bytes on
        # one side never equal a hex str on the other (the r9
        # q_trino_sql_listagg_trunc red) — the b: tag keeps them distinct
        return f"b:{v.hex()}"
    return str(v)


def _canon_frame(pdf: pd.DataFrame, canon=None) -> list[tuple]:
    canon = canon or _canon_value
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(canon(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


def _canon_value_lenient(v):
    """Pre-r9 canon for LOCAL-ONLY comparisons (driver_strict=False):
    stringifies nested cells and absorbs int-vs-float drift. Never use
    for registry keys — the driver does neither."""
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon_value_lenient(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value_lenient(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{_canon_value_lenient(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and not math.isnan(v):
        return f"{v:.9g}"
    return _canon_value(v)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "",
                   driver_strict: bool = True) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    if driver_strict:
        assert_driver_canonicalizable(spark_pdf, name=name, side="spark")
        assert_driver_canonicalizable(oracle_pdf, name=name, side="oracle")
        assert_dtype_kinds_match(spark_pdf, oracle_pdf, name=name)
        s_rows = _canon_frame(spark_pdf)
        o_rows = _canon_frame(oracle_pdf)
    else:
        s_rows = _canon_frame(spark_pdf, _canon_value_lenient)
        o_rows = _canon_frame(oracle_pdf, _canon_value_lenient)
    if s_rows != o_rows:
        diffs = [
            (i, s, o) for i, (s, o) in enumerate(zip(s_rows, o_rows)) if s != o
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs oracle):\n"
            + "\n".join(f"  row {i}:\n    S={s}\n    O={o}" for i, s, o in diffs)
        )


def check_query(spark_df: DataFrame, oracle_con: duckdb.DuckDBPyConnection,
                oracle_sql: str, name: str = "",
                driver_strict: bool = True) -> int:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = oracle_con.sql(oracle_sql).df()
    compare_frames(spark_pdf, oracle_pdf, name=name,
                   driver_strict=driver_strict)
    return len(spark_pdf)
