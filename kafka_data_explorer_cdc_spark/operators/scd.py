"""Slowly-Changing-Dimension Type-2 apply with no-op suppression.

The dimension-maintenance sibling of `cdc/apply.py:scd2_history` (which
materializes versions from a CDC op log, one row per change event):
``scd2_apply`` takes a CURRENT SCD2 dimension table and a batch of
OBSERVED snapshots (key, tracked attributes, observation time) — the
shape dimension feeds actually arrive in (daily extracts, API pulls) —
and produces the new SCD2 state with the real-world nuance op-log
replay doesn't need: **change suppression**. An observation whose
tracked attributes equal the key's previous version is a re-delivery,
not a change, and must NOT open a new version (otherwise every daily
full extract doubles the dimension).

Algorithm (set-based, no per-key loops):

1. existing history rows pass through untouched except possibly the
   open row's ``valid_to``;
2. the open row per key seeds a timeline with the new observations;
   per key, order by time and DROP rows whose tracked attributes equal
   the previous surviving row's — the suppression — computed with one
   LAG over a (seed ∪ observations) union;
   [suppression is vs the immediately preceding DISTINCT version:
   A→B→A is three honest versions, A→A→B is two]
3. surviving rows re-window: ``valid_from`` = own time, ``valid_to`` =
   LEAD time (NULL ⇒ open, ``is_current``).

Physical shape: ONE hash shuffle on the dimension key shared by both
windows (LAG suppression + LEAD re-window — same partitioning, same
sort), plus the pass-through union of closed history (no shuffle).
Dimension tables are small next to facts, but the plan is volume-
independent anyway — at 100 TB of observation feed the suppression
drops re-deliveries BEFORE any version explosion.

A→A chains of any length collapse because LAG sees the previous
SURVIVING row only after consecutive-dup removal — implemented by
comparing against LAG over the raw ordered timeline, which is correct
because a suppressed row is by definition attribute-identical to its
predecessor, so transitive chains compare equal all the way down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_apply"]


def scd2_apply(
    current: DataFrame,
    observations: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str = "observed_at",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Return the post-merge SCD2 table (same schema as ``current``).

    ``current`` columns: keys + tracked + valid_from/valid_to/
    is_current. ``observations``: keys + tracked + ts_col. Multiple
    observations per key in one batch are applied in time order;
    attribute-identical consecutive observations are suppressed; a key
    with no current row simply starts its history at its first
    observation. CALLER CONTRACT: observations must be strictly after
    the key's open ``valid_from`` — an earlier timestamp would splice
    a version into closed history (late data belongs in a bitemporal
    model, not silent reordering); ties on ``__ts`` order the seed
    first deterministically.
    """
    closed = current.filter(~F.col(is_current))
    open_rows = current.filter(F.col(is_current))

    seed = open_rows.select(
        *keys, *tracked, F.col(valid_from).alias("__ts"), F.lit(0).alias("__src")
    )
    obs = observations.select(
        *keys, *tracked, F.col(ts_col).alias("__ts"), F.lit(1).alias("__src")
    )
    timeline = seed.unionByName(obs)

    w = Window.partitionBy(*keys).orderBy("__ts", "__src")
    same_as_prev = None
    for c in tracked:
        eq = F.col(c).eqNullSafe(F.lag(c).over(w))
        same_as_prev = eq if same_as_prev is None else (same_as_prev & eq)
    # a seed row is never suppressed (it IS the current version);
    # an observation equal to its predecessor is a re-delivery
    surviving = timeline.withColumn(
        "__dup",
        (F.col("__src") == 1)
        & F.coalesce(same_as_prev, F.lit(False)),
    ).filter(~F.col("__dup"))

    w2 = Window.partitionBy(*keys).orderBy("__ts", "__src")
    rewindowed = surviving.select(
        *keys,
        *tracked,
        F.col("__ts").alias(valid_from),
        F.lead("__ts").over(w2).alias(valid_to),
        F.lead("__ts").over(w2).isNull().alias(is_current),
    )
    return closed.select(
        *keys, *tracked, valid_from, valid_to, is_current
    ).unionByName(rewindowed)
