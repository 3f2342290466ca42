"""Multi-dimensional data layout for scan pruning (z-order clustering).

The 100 TB problem this solves: a table range-partitioned or sorted on
ONE key prunes scans only for predicates on that key. Interleaving the
bits of several keys into a single z-value and range-partitioning +
sorting on it clusters rows that are close in EVERY dimension into the
same files and row groups — so parquet min/max statistics become tight
on all participating columns at once, and the ordinary pushed-down
predicates (`PushedFilters` on the scan) skip whole row groups for
multi-dimensional range queries. This is the same layout strategy as
Delta Lake's `OPTIMIZE ZORDER BY` / the classic z-order curve, built
here from public first principles with plain DataFrame ops:

1. scale each dimension to an integer in [0, 2^bits) by min/max
   (stats computed distributed, joined back via a 1-row broadcast —
   no driver collect),
2. interleave the bits (dimension c contributes bit j to position
   j*n_dims + c),
3. `repartitionByRange` on the z-value (one range shuffle — sampled
   range boundaries, no skew pileup) and sort within partitions.

Everything stays JVM-side: the z-value is a closed-form bitwise
expression, so the whole layout pass is one whole-stage-codegen
projection plus one range shuffle, no Python in the loop.

Reference parity note: the reference delegates physical layout to ADX
extents (`README.md:121` — ADX shards by ingestion batch); this module
is the engine-native equivalent for parquet at rest.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Z-value of pre-scaled non-negative long columns (each already in
    [0, 2^bits)): bit j of dimension c lands at position j*len(cols)+c.
    Pure bitwise column expression — codegen-friendly, no UDF."""
    n = len(cols)
    parts: list[Column] = []
    for c_idx, c in enumerate(cols):
        for j in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(c, j).bitwiseAND(F.lit(1)),
                    j * n + c_idx,
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("z_value")


def with_zorder(
    df: DataFrame, cols: list[str], bits: int = 16, z_col: str = "_z"
) -> DataFrame:
    """Add a z-value column over ``cols`` (numeric/timestamp). Each
    column is min/max-scaled to ``bits`` bits using a single 1-row
    stats aggregate broadcast back (never collected to the driver)."""
    # one cast covers numerics and timestamps alike (timestamp -> epoch
    # seconds as double)
    numeric = {c: F.col(c).cast("double") for c in cols}
    stats = df.agg(
        *[F.min(numeric[c]).alias(f"__min_{c}") for c in cols],
        *[F.max(numeric[c]).alias(f"__max_{c}") for c in cols],
    )
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        rng = F.col(f"__max_{c}") - F.col(f"__min_{c}")
        scaled.append(
            F.when(rng <= 0, F.lit(0))
            .otherwise(
                F.floor((numeric[c] - F.col(f"__min_{c}")) / rng * top)
            )
            .cast("long")
        )
    out = df.crossJoin(F.broadcast(stats))
    out = out.withColumn(z_col, interleave_bits(scaled, bits))
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` at ``path`` clustered on the z-curve over
    ``cols``: range-partition on the z-value (sampled boundaries — the
    shuffle that replaces a full sort), sort within each partition, and
    drop the helper column before writing. After this pass, parquet
    min/max stats are tight on every clustered column, so pushed-down
    range predicates on ANY of them prune row groups."""
    z = with_zorder(df, cols, bits)
    (
        z.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
