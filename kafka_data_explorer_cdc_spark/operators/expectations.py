"""Declarative data-quality expectations, audited in ONE scan.

The constraint-validation surface of Delta Live Tables expectations /
Great Expectations / dbt tests, as a DataFrame operator: the caller
declares rules —

    audit(df, [
        not_null("o_custkey"),
        in_range("o_totalprice", 0, 600000),
        matches("o_orderpriority", r"^[1-5]-"),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
        unique(["o_orderkey"]),
    ])

— and gets back one long-form report row per rule: rows checked,
violations, pass flag. Unlike b60's single-purpose referential audit
or b64's statistical profiler, this is the user-facing CONTRACT form:
rules are data, the report is the gate a pipeline promotes on.

Physical shape (the 100 TB contract): every row-local rule compiles to
``sum(when(violated, 1))`` inside ONE shared aggregate — adding a rule
adds a codegen expression, never a scan. ``unique`` rules ride the
same aggregate as ``count(*) − count_distinct(struct(keys))``
(Catalyst's Expand-based multi-distinct rewrite keeps it single-pass —
the b64/d62 audited shape). The wide 1-row result is unpivoted to the
long report with ``stack`` — driver-free, still one job. Regexes must
stay in the Java∩RE2 subset (the d21 discipline) so the report is
engine-portable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Expectation",
    "accepted_values",
    "audit",
    "in_range",
    "matches",
    "not_null",
    "unique",
]


@dataclass(frozen=True)
class Expectation:
    """A named rule: either row-local (``violated`` — a boolean Column
    that is True where the row breaks the rule) or a key-uniqueness
    rule (``unique_keys``)."""

    name: str
    violated: Column | None = None
    unique_keys: tuple[str, ...] = ()


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", violated=F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"in_range({col},{lo:g},{hi:g})",
        violated=c.isNull() | (c < lo) | (c > hi),
    )


def matches(col: str, pattern: str) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"matches({col})", violated=c.isNull() | ~c.rlike(pattern)
    )


def accepted_values(col: str, values: list) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"accepted_values({col})", violated=c.isNull() | ~c.isin(values)
    )


def unique(keys: list[str]) -> Expectation:
    return Expectation(
        f"unique({','.join(keys)})", unique_keys=tuple(keys)
    )


def audit(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """One-scan audit: DataFrame[rule, rows, violations, passed]."""
    if not rules:
        raise ValueError("audit needs at least one expectation")
    seen: set[str] = set()
    for r in rules:
        if r.name in seen:
            raise ValueError(f"duplicate expectation name {r.name!r}")
        seen.add(r.name)

    aggs = [F.count("*").alias("__rows")]
    for i, r in enumerate(rules):
        if r.unique_keys:
            # duplicates = rows − distinct keys; rows where any key is
            # NULL count as violations too (a NULL key cannot be
            # asserted unique), mirroring SQL UNIQUE constraints that
            # engines disagree on — here the strict reading is pinned.
            ks = [F.col(k) for k in r.unique_keys]
            nn = None
            for k in ks:
                c = k.isNotNull()
                nn = c if nn is None else (nn & c)
            aggs.append(
                (
                    F.count("*")
                    - F.count_distinct(F.struct(*ks))
                    + F.sum(F.when(~nn, 1).otherwise(0))
                ).alias(f"__v{i}")
            )
        else:
            aggs.append(
                F.sum(F.when(r.violated, 1).otherwise(0))
                .cast("bigint")
                .alias(f"__v{i}")
            )
    wide = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{r.name.replace(chr(39), '')}', __v{i}"
        for i, r in enumerate(rules)
    )
    return wide.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, violations)"
        ),
        F.col("__rows").alias("rows"),
    ).select(
        "rule",
        "rows",
        F.coalesce(F.col("violations"), F.lit(0)).alias("violations"),
        (F.coalesce(F.col("violations"), F.lit(0)) == 0).alias("passed"),
    )
