"""Distributed dense row-id assignment — global ranks without a
global sort.

``ROW_NUMBER() OVER (ORDER BY key)`` with an empty PARTITION BY is the
classic single-node trap: Catalyst compiles it to an Exchange
SinglePartition + one task sorting the entire table — at 100 TB that
is THE bottleneck, not a slowdown. The distributed equivalent is the
zipWithIndex recipe, expressed DataFrame-only:

1. ``repartitionByRange(key)`` — one range shuffle (sampled
   boundaries), every partition holds a disjoint, ordered key range;
2. ``sortWithinPartitions(key)`` — local sorts, no exchange;
3. ``monotonically_increasing_id()`` — per row, partition ordinal in
   the upper bits and the ROW-ORDER counter in the lower 33 bits, so
   (partition, local_rank) falls out with two bit ops and no window
   (a ``Window.partitionBy(spark_partition_id())`` would re-Exchange —
   Catalyst cannot see that the data is already clustered);
4. per-partition counts (one metadata-sized agg) → prefix-sum offsets
   on the driver (numPartitions rows, bounded) → broadcast-joined
   back: ``id = offset[partition] + local_rank``.

Total movement: one range shuffle + one tiny agg + one broadcast join.
Ids are dense (1..n) and equal to the global ORDER BY rank whenever
``key`` is unique — with duplicate keys, ties ACROSS a sampled range
boundary would get assignment-dependent ids, so this operator requires
a unique key and the b93 oracle pins exact equality with ROW_NUMBER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def distributed_row_ids(
    df: DataFrame, key: str, id_col: str = "rid", partitions: int | None = None
) -> DataFrame:
    """Add dense 1-based global ids ordered by unique ``key`` (module
    docstring: the sort-free zipWithIndex recipe)."""
    n_part = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_part, F.col(key))
        .sortWithinPartitions(key)
        .withColumn("__mid", F.monotonically_increasing_id())
        # Exact bit arithmetic, not float division: doubles carry a
        # 53-bit mantissa, so (mid / 2^33) can truncate into the WRONG
        # partition once the ordinal bits meet a full 33-bit counter.
        .withColumn("__pid", F.shiftrightunsigned(F.col("__mid"), 33))
        .withColumn(
            "__lrn", F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
        )
        # REQUIRED, not an optimization: the counts job below and the
        # final join are two executions, and repartitionByRange
        # re-SAMPLES its boundaries per execution — without pinning the
        # materialization, the offsets describe one partitioning and
        # the ids another (observed: duplicated/missing ranks at every
        # boundary). localCheckpoint truncates lineage so both reads
        # hit the SAME stored blocks; at scale this one materialization
        # is the price of the sort-free global rank and still beats the
        # single-task global sort by the width of the cluster.
        # Lazy (optimization r13): the counts job right below is the
        # first action — it materializes the checkpoint blocks as a
        # side effect, so a separate eager materialization job is
        # pure overhead; the pinning guarantee (both reads hit the
        # same stored blocks) is unchanged.
        .localCheckpoint(eager=False)
    )
    counts = (
        ranged.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"))
        .orderBy("__pid")
        .collect()  # bounded: one row per partition
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["__pid"], acc))
        acc += r["__cnt"]
    off_df = df.sparkSession.createDataFrame(
        offsets, "__pid long, __off long"
    )
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(id_col, F.col("__off") + F.col("__lrn") + F.lit(1))
        .drop("__mid", "__pid", "__lrn", "__off")
    )
