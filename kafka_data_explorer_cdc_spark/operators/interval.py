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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.date_trunc("DAY", F.col(start_col)),
                F.date_trunc("DAY", F.col(end_col)),
                F.expr(f"interval {bucket}"),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.date_trunc("DAY", F.col(point_col)))
    return (
        pt.join(iv, "__bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
