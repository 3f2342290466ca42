"""Skew mitigation: salting for hot keys.

AQE's skew-join handling (on in ``session.py``) splits oversized
partitions at runtime, but only for sort-merge joins; two cases still
need explicit salting at 100 TB:

1. **Skewed aggregation** — one hot group (the empty-string language,
   the null user) lands on one reducer. :func:`salted_aggregate` runs
   the combine in two phases: partial agg on (key, salt) spreads the
   hot key over ``buckets`` reducers, final agg on (key) merges the
   partials. Requires algebraic aggregates (sum/count/min/max — the
   merge is the same op; avg = sum/count assembled at the end).
2. **Skewed join against a non-broadcastable side** —
   :func:`salted_join` salts the skewed (probe) side randomly and
   replicates the build side across all salt values, turning one hot
   reducer into ``buckets`` balanced ones at the cost of a
   ``buckets``× build-side replication (explode of a literal range —
   rows, not bytes, until the shuffle).

Salting is semantics-neutral: the oracle twin of the demo query is the
UNSALTED aggregation, so the differential gate proves the rewrite
changes the shuffle, not the answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. count partials merge with SUM; the other
    three merge with themselves. An input column of ``"*"`` (or None)
    means COUNT(*) — counting rows, not non-null values. Counting a
    grouping column instead would skip NULL-keyed rows (COUNT(col)
    semantics), silently reporting 0 for a NULL group.
    """
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    def _partial(col: str | None, fn: str):
        if fn == "count" and col in (None, "*"):
            return F.count(F.lit(1))
        return partial_fns[fn](col)

    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_partial(col, fn).alias(out) for out, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fns[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, replicate the other
    side over every salt value, join on (key, salt). Use when ``other``
    is too big to broadcast but small enough to replicate ``buckets``×
    into the shuffle."""
    salted = skewed.withColumn("__salt", (F.rand(seed=42) * buckets).cast("int"))
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
