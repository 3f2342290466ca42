"""Bucketized interval join — range predicates WITHOUT an equi key.

b06's range join leans on an equi key (user_id) to carry the shuffle,
with the range predicate filtering post-shuffle per key group. When no
equi key exists — "which points fall inside which time windows" — the
naive plan is a BroadcastNestedLoopJoin / cartesian scan: every point
against every interval, O(P·W), the join that dies first at scale.

The scalable strategy turns the range predicate INTO an equi key:

1. explode each interval into the fixed-width buckets it covers
   (fan-out = ceil(len/bucket) + 1 rows per interval);
2. equi-join points on their single containing bucket — an ordinary
   hash shuffle/broadcast join, partitionable like any other;
3. re-check the EXACT ``point BETWEEN start AND end`` predicate
   post-join (bucket overlap is a superset of true overlap);
4. no dedup is needed for point-in-interval: a point lives in exactly
   one bucket, so each true (point, interval) pair is emitted once.

Bucket sizing is the one knob: ~the median interval length. Too small
→ interval fan-out explodes; too large → each bucket pairs points with
intervals they miss and step 3 discards the excess. Both failure modes
are linear and observable (bucket-rows metric), never quadratic.

Both sides MUST bucket on the same grid, so the bucket key is the
integer epoch-quotient ``floor(unix_seconds / width)`` — not a
date_trunc that only agrees with the stepped interval sequence when
the width happens to be exactly one day (the round-8 bug: any other
width silently dropped true matches because points were day-truncated
while intervals stepped on a ``bucket``-wide grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Fixed-width units only: month/year intervals have data-dependent
# lengths and cannot define a uniform grid.
_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _bucket_seconds(bucket: str) -> int:
    """Parse '2 days' / 'hour' into an exact width in seconds, raising
    on anything that does not define a fixed-width grid."""
    parts = bucket.strip().lower().split()
    if len(parts) == 1:
        n, unit = 1, parts[0]
    elif len(parts) == 2:
        n, unit = int(parts[0]), parts[1]
    else:
        raise ValueError(f"unsupported bucket spec: {bucket!r}")
    unit = unit.rstrip("s")
    if unit not in _UNIT_SECONDS or n <= 0:
        raise ValueError(
            f"bucket must be a positive count of "
            f"{sorted(_UNIT_SECONDS)} (fixed-width grid); got {bucket!r}"
        )
    return n * _UNIT_SECONDS[unit]


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them
    (inclusive bounds), via the bucketized equi-join strategy in the
    module docstring. Output: all columns of both inputs."""
    width = F.lit(_bucket_seconds(bucket))
    # floor() of the epoch quotient keeps the arithmetic on longs
    # JVM-side; epoch seconds (< 2^35) are exact in the double divide.
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / width),
                F.floor(F.unix_timestamp(F.col(end_col)) / width),
            )
        ),
    )
    pt = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(point_col)) / width)
    )
    return (
        pt.join(iv, "__bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
