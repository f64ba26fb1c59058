"""Order-insensitive DataFrame vs DuckDB comparison — local stand-in for
the driver's correctness gate (row count + schema-shape + value compare).

Stricter than a hash: on mismatch it reports which rows differ.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

FLOAT_REL_TOL = 1e-9
FLOAT_ABS_TOL = 1e-9


def _canon_value(v):
    import numpy as np
    if isinstance(v, np.ndarray):  # DuckDB returns list columns as ndarrays
        return "[" + ",".join(_canon_value(x) for x in v.tolist()) + "]"
    if isinstance(v, np.generic):  # numpy scalar → native (repr-stable)
        v = v.item()
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        # round-trip through repr at reduced precision to absorb
        # platform-level last-bit differences
        return f"{v:.9g}"
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_value(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = _canon_frame(spark_pdf)
    o_rows = _canon_frame(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (i, s, o) for i, (s, o) in enumerate(zip(s_rows, o_rows)) if s != o
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs oracle):\n"
            + "\n".join(f"  row {i}:\n    S={s}\n    O={o}" for i, s, o in diffs)
        )


def check_query(spark_df: DataFrame, oracle_con: duckdb.DuckDBPyConnection,
                oracle_sql: str, name: str = "") -> int:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = oracle_con.sql(oracle_sql).df()
    compare_frames(spark_pdf, oracle_pdf, name=name)
    return len(spark_pdf)
