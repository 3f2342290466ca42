"""Incremental materialized-view maintenance over a CDC stream.

The reference's downstream (ADX) re-aggregates the full append-only
change table on every dashboard query (``README.md:366-389``). The
warehouse-native upgrade is a MAINTAINED aggregate: each micro-batch
applies only its keys' delta to the stored per-group aggregate, so a
dashboard read is O(groups) and ingest cost is O(batch), independent of
total history — the shape every streaming-warehouse system (Delta Live
Tables, Materialize, Flink dynamic tables) implements for SUM/COUNT
views.

Delta algebra per micro-batch, all distributed and bounded by the
batch's key set:

1. ``old`` = prior state rows for the batch's keys (bucket-pruned read
   of the incremental state sink — O(touched buckets), not O(state));
2. ``new`` = ``apply_cdc_batch(old, batch)`` computed in-memory (live
   rows only — deletes contribute nothing);
3. ``delta[group] = agg(new) - agg(old_live)`` (decimal-exact);
4. stored view += delta (full-outer join on group, versioned write,
   atomic pointer).

Crash/replay safety: the view manifest records the last applied
batch_id; a replayed micro-batch (checkpoint recovery) is skipped at
step 4 while the underlying state merge stays idempotent on its own —
the same transactional-foreachBatch pattern Delta documents for
exactly-once sinks. The view update runs BEFORE the state merge so a
crash between the two replays into (skip view, redo merge) — never a
double-count. SUM/COUNT are self-inverting under deltas; MIN/MAX are
not (a delete can require a rescan) — this sink is the algebraic-
aggregate form.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.apply import apply_cdc_batch
from .pipeline import CdcStateSink, ParquetStateSink


class AggViewSink(CdcStateSink):
    """Maintains ``SELECT group_col, COUNT(*), SUM(value_col) GROUP BY
    group_col`` over the live CDC state, incrementally, on top of a
    :class:`ParquetStateSink` (which remains the source of truth and
    the replay/idempotence anchor)."""

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        key_cols: list[str],
        group_col: str,
        value_col: str,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.inner = ParquetStateSink(spark, state_root, key_cols, n_buckets)
        self.key_cols = key_cols
        self.group_col = group_col
        self.value_col = value_col
        self.view_root = os.path.join(state_root, "agg_view")
        os.makedirs(self.view_root, exist_ok=True)

    # -- view storage -----------------------------------------------
    def _pointer(self) -> str:
        return os.path.join(self.view_root, "VIEW_LATEST")

    def _view_manifest(self) -> dict | None:
        try:
            with open(self._pointer()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def view(self) -> DataFrame | None:
        """The maintained aggregate (groups with count 0 dropped)."""
        m = self._view_manifest()
        if m is None:
            return None
        df = self.spark.read.parquet(
            os.path.join(self.view_root, f"agg_v{m['version']}")
        )
        return df.filter(F.col("n_rows") > 0).select(
            F.col(self.group_col),
            F.col("n_rows"),
            F.col("sum_dec").cast("double").alias("sum_value"),
        )

    def current(self) -> DataFrame | None:
        return self.inner.current()

    # -- per-batch maintenance --------------------------------------
    def _agg(self, df: DataFrame) -> DataFrame:
        return df.groupBy(self.group_col).agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col(self.value_col).cast("decimal(18,2)")).alias("sum_dec"),
        )

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            self._apply(batch, batch_id)
        finally:
            batch.unpersist()

    def _apply(self, batch: DataFrame, batch_id: int) -> None:
        sink = self.inner
        good = batch.filter(
            F.col(self.key_cols[0]).isNotNull() & F.col("lsn").isNotNull()
        )
        if "raw_value" in good.columns:
            good = good.drop("raw_value")
        keys = good.select(*self.key_cols).distinct()

        m = self._view_manifest()
        if m is None or batch_id > m["last_batch_id"]:
            # old rows for this batch's keys: bucket-pruned state read
            prev_manifest = sink._manifest()
            old = None
            if prev_manifest is not None:
                touched = {
                    int(r["__b"])
                    for r in keys.select(
                        sink._bucket_col().alias("__b")
                    ).distinct().collect()
                }
                cur = sink._read_buckets(prev_manifest["buckets"], only=touched)
                if cur is not None:
                    old = cur.join(keys, self.key_cols, "left_semi")
            old_live = (
                old.filter(F.col("op") != "d") if old is not None else None
            )
            new_live = apply_cdc_batch(
                old, good, self.key_cols, keep_deletes=False
            )
            new_agg = self._agg(new_live).alias("n")
            old_agg = (
                self._agg(old_live).alias("o")
                if old_live is not None
                else None
            )
            if old_agg is None:
                delta = new_agg.select(
                    self.group_col,
                    F.col("n_rows").alias("d_rows"),
                    F.col("sum_dec").alias("d_sum"),
                )
            else:
                g = self.group_col
                delta = (
                    new_agg.join(
                        old_agg, F.col(f"n.{g}").eqNullSafe(F.col(f"o.{g}")), "full_outer"
                    )
                    .select(
                        F.coalesce(F.col(f"n.{g}"), F.col(f"o.{g}")).alias(g),
                        (
                            F.coalesce(F.col("n.n_rows"), F.lit(0))
                            - F.coalesce(F.col("o.n_rows"), F.lit(0))
                        ).alias("d_rows"),
                        (
                            F.coalesce(F.col("n.sum_dec"), F.lit(0).cast("decimal(18,2)"))
                            - F.coalesce(F.col("o.sum_dec"), F.lit(0).cast("decimal(18,2)"))
                        ).alias("d_sum"),
                    )
                )
            prior_view = None
            if m is not None:
                prior_view = self.spark.read.parquet(
                    os.path.join(self.view_root, f"agg_v{m['version']}")
                )
            if prior_view is None:
                updated = delta.select(
                    self.group_col,
                    F.col("d_rows").cast("long").alias("n_rows"),
                    F.col("d_sum").cast("decimal(18,2)").alias("sum_dec"),
                )
            else:
                g = self.group_col
                updated = (
                    prior_view.alias("p")
                    .join(delta.alias("d"), F.col(f"p.{g}").eqNullSafe(F.col(f"d.{g}")), "full_outer")
                    .select(
                        F.coalesce(F.col(f"p.{g}"), F.col(f"d.{g}")).alias(g),
                        (
                            F.coalesce(F.col("p.n_rows"), F.lit(0))
                            + F.coalesce(F.col("d.d_rows"), F.lit(0))
                        ).cast("long").alias("n_rows"),
                        (
                            F.coalesce(F.col("p.sum_dec"), F.lit(0).cast("decimal(18,2)"))
                            + F.coalesce(F.col("d.d_sum"), F.lit(0).cast("decimal(18,2)"))
                        ).cast("decimal(18,2)").alias("sum_dec"),
                    )
                )
            out = os.path.join(self.view_root, f"agg_v{batch_id}")
            updated.write.mode("overwrite").parquet(out)
            tmp = self._pointer() + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"version": batch_id, "last_batch_id": batch_id}, f)
            os.replace(tmp, self._pointer())
        # state merge last: a crash above replays into (skip view, redo
        # merge); the merge itself is idempotent either way
        self.inner.apply_batch(batch, batch_id)
