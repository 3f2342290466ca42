"""DuckDB-oracle differential harness.

Mirrors the driver's comparison: row count + column names + an
order-insensitive value comparison with columns sorted by name, doubles
rounded to 6 decimals, timestamps in UTC (FIXTURES.md canonicalization
rules).
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

import duckdb
import pandas as pd

from kafka_data_explorer_cdc_spark.io import TABLES

SF_NAMES = TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in SF_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def _canon_dtype(s: pd.Series) -> str:
    """Driver-strictness dtype canonicalization.

    Benign representation differences are normalized — integer widths
    (DuckDB int32 vs Spark int64), float widths, datetime precision
    (ns vs us), object-vs-string — but TZ-AWARENESS IS KEPT DISTINCT:
    a DuckDB TIMESTAMPTZ (datetime64[us, UTC]) against a naive Spark
    timestamp is a schema mismatch to the driver even when every value
    is identical (the k103 r11 failure class), so it must fail here
    too, in pytest, before a driver round is spent on it.
    """
    dt = s.dtype
    if isinstance(dt, pd.DatetimeTZDtype):
        return "datetime+tz"
    kind = getattr(dt, "kind", "O")
    if kind == "M":
        return "datetime"
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "m":
        return "timedelta"
    # object columns: decimals, strings, lists, bytes — the value
    # canonicalization below is the real check for these.
    return "object"


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
    )
    dt_mism = {
        c: (_canon_dtype(sp[c]), _canon_dtype(oracle_df[c]))
        for c in sp.columns
        if _canon_dtype(sp[c]) != _canon_dtype(oracle_df[c])
        # int-valued DOUBLE vs BIGINT and decimal-object vs float are
        # value-identical under the 6-decimal rounding the driver
        # applies; only flag genuinely different families.
        and {_canon_dtype(sp[c]), _canon_dtype(oracle_df[c])}
        not in ({"int", "float"}, {"object", "float"}, {"object", "int"})
    }
    assert not dt_mism, f"{name}: dtype mismatch (spark, oracle): {dt_mism}"
    a, b = canonicalize(sp), canonicalize(oracle_df)
    assert len(a) == len(b), f"{name}: row count spark={len(a)} oracle={len(b)}"
    mism = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[:3]}"
