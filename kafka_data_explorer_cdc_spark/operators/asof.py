"""As-of join: match each left row with the most recent right row at or
before its timestamp — the canonical time-series join (trade↔quote,
event↔latest-state) that Spark has no native operator for.

Spark-first composition, NOT a theta-join: a theta `l.ts >= r.ts` join
explodes to O(|L|·|R|) per key before aggregation. Instead both sides
union into one keyed stream and a single window pass carries the last
seen right value forward onto each left row:

    union → window(partitionBy key, orderBy (ts, side)) →
    last(right_payload, ignorenulls=True) → filter left rows

One shuffle on the key, O(|L|+|R|) rows, works at any skew AQE can
split. Right rows sort before left rows at equal timestamps, so the
match condition is ``right.ts <= left.ts`` inclusive — the same
semantics as DuckDB's ``ASOF JOIN`` (which verifies this operator in
the differential gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.ts <= left.ts`` in the same key group.

    Right rows must be unique per (key, ts) — pre-aggregate if not
    (ambiguous as-of matches are a modeling error, not a tie to break
    silently). ``how='left'`` keeps unmatched left rows with nulls;
    ``'inner'`` drops them. Output: all left columns plus each right
    value column prefixed ``asof_``.
    """
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (*key_cols, ts_col)
    ]
    payload = F.struct(*[F.col(c) for c in right_value_cols])

    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__payload", F.lit(None).cast(right.select(payload).schema[0].dataType)
    )
    r = right.select(
        *key_cols,
        ts_col,
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    # align schemas: right rows carry nulls for left-only columns
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.select(*left.columns, "__side", "__payload").unionByName(
        r.select(*left.columns, "__side", "__payload")
    )

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    # match detection on the struct itself, not its first payload field:
    # a matched right row whose first value column is legitimately NULL
    # must still count as a match for how='inner'.
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())
    return matched.select(
        *left.columns,
        *[
            F.col("__match").getField(c).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
