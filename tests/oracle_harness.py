"""Local mimic of the driver's DuckDB-oracle compare.

Normalizes both result sets the way the driver does (columns sorted by
name, order-insensitive values) plus type canonicalization so we can debug
mismatches locally before the driver's CORRECTNESS gate runs.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def _canon_value(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return f"{v:.6f}"
    if isinstance(v, (int,)):
        return f"{float(v):.6f}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def _canon_dtype(dt) -> str:
    """Collapse dtypes into the families the driver's schema_match cares
    about, so an int-vs-bigint or float32-vs-float64 drift fails locally
    instead of only at the driver."""
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float", "double")):
        return "float"
    if s.startswith(("datetime", "timestamp")):
        return "datetime"
    if s == "bool":
        return "bool"
    return "str"


def _canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_value(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


def compare(spark_df: DataFrame, duck_con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert spark result == duckdb oracle result (driver semantics)."""
    got = spark_df.toPandas()
    want = duck_con.execute(sql).df()

    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    got_types = {c: _canon_dtype(got.dtypes[c]) for c in got.columns}
    want_types = {c: _canon_dtype(want.dtypes[c]) for c in want.columns}
    # 'object' pandas columns (strings, lists, NULL-heavy ints) canonicalize
    # to 'str' on either side; only flag a drift when both sides are typed.
    mismatched = {
        c: (got_types[c], want_types[c])
        for c in got.columns
        if "str" not in (got_types[c], want_types[c])
        and got_types[c] != want_types[c]
    }
    assert not mismatched, f"dtype mismatch (spark, oracle): {mismatched}"
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"

    g = _canon_frame(got)
    w = _canon_frame(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
