"""Shared expression helpers used across the query inventory."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent exact SUM of a 2-decimal money column.

    Sums in DECIMAL(18,2) (exact, associative) then casts to DOUBLE so
    the output schema is stable across engines. DuckDB twin:
    ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS alias``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,2)")).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Exact decimal-sum / count average, emitted as DOUBLE.

    DuckDB twin: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
    / COUNT(x) AS alias`` — both engines then perform the identical
    double/int64 division.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast("decimal(18,2)")).cast("double") / F.count(c)).alias(alias)


SQL_DSUM = "CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"
SQL_DAVG = "CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col})"
