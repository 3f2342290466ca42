"""CDC apply: latest-state materialization + idempotent batch upsert.

The reference's sink is at-least-once (Connect offset topics,
``docker-compose.yaml:35-37``) and append-only — ADX receives every
change event. Materializing "current state of the source table" from a
CDC log is the canonical downstream task (SURVEY.md §2A A12):

- total order within a key comes from ``lsn`` (``README.md:284-286``)
- ``op='d'`` tombstones the key; ``before``-image carries the key
- at-least-once duplicates (same ``lsn`` replayed) must collapse

Spark-first: a single ``row_number()`` window over ``(key ORDER BY lsn
DESC)`` — one shuffle on the key, no driver-side state, arbitrarily
partitionable ⇒ scales to 100 TB of change log. At cluster scale the
same logic runs incrementally in ``foreachBatch`` as a keyed MERGE into
Delta/Iceberg (see ``streaming/pipeline.py``); the batch form here is
the semantics oracle for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_state(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "d",
    keep_deletes: bool = False,
) -> DataFrame:
    """Collapse a CDC change log to current state.

    ``changes`` must carry one row per change event with a flat
    after-image, the key columns, a monotone sequence column, and the op
    code. Duplicate (key, seq) deliveries collapse automatically because
    ``row_number`` picks exactly one row per key. With
    ``keep_deletes=True`` the winning tombstones survive (needed when
    compacting a micro-batch that must still delete from prior state).

    Ties on ``seq_col`` break deterministically on the op code (desc:
    u > d > c). A real WAL never assigns one lsn to two distinct events
    for a key — ties only arise from at-least-once redelivery, where the
    rows are identical and any pick is right — but a deterministic order
    keeps the winner stable across plans/partitionings regardless.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    out = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if not keep_deletes:
        out = out.filter(F.col(op_col) != delete_op)
    return out


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "d",
) -> DataFrame:
    """Type-2 slowly-changing-dimension view of a CDC log: one row per
    version of each key, with ``valid_from``/``valid_to`` sequence
    bounds and ``is_current``.

    Each change event opens a version valid from its own sequence
    number until the key's next event (``lead`` over the key window);
    the newest non-delete version per key is current; delete events
    close the prior version but contribute no row themselves. One
    window shuffle on the key — the same scale shape as latest_state
    (SURVEY.md §2A A12 extended to full history, the standard warehouse
    materialization of a Debezium stream).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    versioned = changes.withColumn(
        "valid_to", F.lead(F.col(seq_col)).over(w)
    ).withColumn(
        "is_current",
        (F.col("valid_to").isNull()) & (F.col(op_col) != delete_op),
    )
    return (
        versioned.filter(F.col(op_col) != delete_op)
        .withColumnRenamed(seq_col, "valid_from")
    )


def apply_cdc_batch(
    current: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    seq_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "d",
    keep_deletes: bool = False,
) -> DataFrame:
    """Idempotent micro-batch MERGE, expressed relationally.

    Equivalent of ``MERGE INTO current USING batch ON key WHEN MATCHED
    [AND op='d'] DELETE / UPDATE WHEN NOT MATCHED INSERT`` — but keeps
    the seq column so replays (at-least-once) and out-of-order batches
    are idempotent: the highest ``lsn`` always wins, exactly like the
    reference's ADX table dedup story would require.

    With a transactional table format (Delta/Iceberg) this becomes a
    real MERGE in ``foreachBatch``; on plain parquet we rewrite the
    union's latest state, which is correct though not incremental.

    ``current`` must be a prior output of this function (it retains the
    ``seq``/``op`` columns of each key's winning event, which is what
    makes replays idempotent).

    **Chained (stored) use MUST pass ``keep_deletes=True``.** If the
    stored state drops tombstones, it has no memory of a delete's
    ``lsn`` — a lower-lsn straggler for the same key in a LATER batch
    (micro-batch boundaries give no cross-batch ordering guarantee)
    would then resurrect the deleted key. Retain the winning tombstone
    rows in the persisted form and filter ``op != delete_op`` only in
    the *read* view (see ``ParquetStateSink.current``); drop them only
    when a GC horizon guarantees no older event can still arrive.
    ``keep_deletes=False`` is the one-shot/terminal form.
    """
    compacted = latest_state(
        batch, key_cols, seq_col, op_col, delete_op, keep_deletes=True
    )
    if current is None:
        merged = compacted
    else:
        merged = current.unionByName(compacted, allowMissingColumns=True)
    return latest_state(
        merged, key_cols, seq_col, op_col, delete_op, keep_deletes=keep_deletes
    )
