"""Count-min sketch as a mergeable TABLE — frequency estimation at rest.

The 100 TB shape: exact per-key counts of a high-cardinality column
need a full shuffle of every key; a count-min sketch is a fixed
``depth x width`` grid of counters that (a) builds with one map-side
combinable aggregation whose key space is bounded by ``depth*width``
regardless of data volume, (b) merges across partitions / days /
tables by plain counter addition (linearity), and (c) answers point
frequency queries with the one-sided guarantee

    estimate >= true count            (always — no false negatives)
    estimate <= true + (e/width)*N    (w.p. 1 - (1/2)^depth per query)

so over-counting is the only error mode. Built entirely from JVM-side
column expressions (``xxhash64`` + ``pmod`` + ``groupBy``): no UDF, no
driver state — the sketch itself is a tiny DataFrame you can persist
to parquet next to the data it summarizes (the same at-rest pattern as
the HLL rollup in b41).

Public-knowledge basis: Cormode & Muthukrishnan, "An improved data
stream summary: the count-min sketch and its applications" (2005).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_merge", "cms_estimate"]


def _bucket(key_col, d_col, width: int, seed: int):
    """Bucket for (key, hash-row d): xxhash64(key, d + seed) mod width.
    Shared by build and estimate — the two MUST agree bit-for-bit."""
    return F.pmod(
        F.xxhash64(key_col, d_col + F.lit(seed)), F.lit(width)
    ).cast("int")


def cms_build(
    df: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
    seed: int = 7,
    weight: str | None = None,
) -> DataFrame:
    """Build a count-min sketch of ``df[col]`` as a DataFrame with
    schema ``(d int, bucket int, cnt long)`` (at most depth*width
    rows). Each input row fans out to ``depth`` (d, bucket) cells via
    one ``explode`` of a literal range; the aggregation partial-merges
    map-side, so the shuffle carries at most depth*width rows per
    partition no matter the input size. ``weight`` sums a column
    instead of counting rows."""
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    rows = df.select(F.col(col).alias("__k"), w.alias("__w")).select(
        "__k",
        "__w",
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    )
    return (
        rows.withColumn("bucket", _bucket(F.col("__k"), F.col("d"), width, seed))
        .groupBy("d", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (width, depth, seed): union
    then re-sum — counter addition, the linearity property that makes
    per-partition / per-day sketches composable."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Point-frequency estimates for ``keys[col]``: each key probes its
    ``depth`` cells (broadcast join against the tiny sketch) and takes
    the MIN counter. Missing cells count as 0. Returns the key column
    plus ``est long``."""
    probes = keys.select(F.col(col)).distinct().select(
        F.col(col),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    ).withColumn("bucket", _bucket(F.col(col), F.col("d"), width, seed))
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left").select(
        col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cell")
    )
    return joined.groupBy(col).agg(F.min("cell").alias("est"))
