"""Change data feed: row-level change capture OUT of the state store.

Delta's Change Data Feed / Iceberg's changelog: downstream consumers
(cache invalidation, search indexing, cascading materializations) need
the NET row-level changes each commit produced — not the raw
at-least-once CDC input (which contains replays, stragglers, and
intra-batch churn the merge arbitrates away), and not a full state
diff. This sink derives the feed from the merge itself via
:class:`ParquetStateSink`'s ``on_merge`` hook: classify ``cur`` (pre)
vs ``merged`` (post) rows of the touched buckets by key —

- key absent-or-tombstoned in pre, live in post  → ``insert``
- key live in pre, tombstoned in post            → ``delete``
  (carrying the pre-image)
- key live in both with a different winning lsn  → ``update_preimage``
  + ``update_postimage`` (Delta CDF's two-row convention)
- tombstone-to-tombstone re-arbitration           → no visible change

Each batch appends its rows under ``feed/batch_{id}/`` with
``_change_type`` and ``_commit_version`` columns; a replayed
micro-batch is skipped by the feed manifest (and would classify to
zero changes anyway — ``merged == cur`` on replay). The feed is
therefore effectively-exactly-once even though the input is
at-least-once: exactly the upgrade consumers need.

Scale: classification is one keyed full-outer join over the touched
buckets (already in memory from the merge — ``merged`` arrives
persisted), appends are partitioned by commit, and a consumer reads
only commits newer than its cursor.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .pipeline import CdcStateSink, ParquetStateSink


class ChangeFeedSink(CdcStateSink):
    """:class:`ParquetStateSink` plus a per-commit row-level change
    feed derived from each micro-batch's merge."""

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        key_cols: list[str],
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.key_cols = key_cols
        self.inner = ParquetStateSink(
            spark, state_root, key_cols, n_buckets, on_merge=self._emit
        )
        self.feed_root = os.path.join(state_root, "feed")
        os.makedirs(self.feed_root, exist_ok=True)

    # -- CdcStateSink surface ---------------------------------------
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        self.inner.apply_batch(batch, batch_id)

    def current(self) -> DataFrame | None:
        return self.inner.current()

    # -- feed storage -----------------------------------------------
    def _pointer(self) -> str:
        return os.path.join(self.feed_root, "FEED_LATEST")

    def _manifest(self) -> dict | None:
        try:
            with open(self._pointer()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def feed(self, since_version: int | None = None) -> DataFrame | None:
        """All change rows, optionally only commits > ``since_version``
        (the consumer-cursor read path: O(new commits), not O(feed))."""
        m = self._manifest()
        if m is None:
            return None
        dirs = [
            os.path.join(self.feed_root, d)
            for d in sorted(os.listdir(self.feed_root))
            if d.startswith("batch_")
            and int(d[len("batch_"):]) <= m["last_batch_id"]
            and (since_version is None or int(d[len("batch_"):]) > since_version)
        ]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def compact(self) -> DataFrame | None:
        """Replay the feed into latest state — per key, the winning row
        of the newest commit (postimages only); deletes drop the key.
        Must equal ``current()`` — the feed-completeness invariant."""
        f = self.feed()
        if f is None:
            return None
        w = Window.partitionBy(*self.key_cols).orderBy(
            F.col("_commit_version").desc(), F.col("lsn").desc()
        )
        latest = (
            f.filter(F.col("_change_type") != "update_preimage")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        return latest.filter(F.col("_change_type") != "delete").drop(
            "_change_type", "_commit_version"
        )

    # -- the on_merge hook ------------------------------------------
    def _emit(
        self, cur: DataFrame | None, merged: DataFrame, batch_id: int
    ) -> None:
        m = self._manifest()
        if m is not None and batch_id <= m["last_batch_id"]:
            return  # replay: feed already has this commit
        cols = merged.columns
        live = lambda side: F.col(f"{side}.op") != "d"  # noqa: E731
        if cur is None:
            changes = merged.filter(F.col("op") != "d").withColumn(
                "_change_type", F.lit("insert")
            )
        else:
            k0 = self.key_cols[0]
            cond = [
                F.col(f"pre.{k}").eqNullSafe(F.col(f"post.{k}"))
                for k in self.key_cols
            ]
            j = cur.alias("pre").join(merged.alias("post"), cond, "full_outer")
            pre_live = F.col(f"pre.{k0}").isNotNull() & live("pre")
            post_live = F.col(f"post.{k0}").isNotNull() & live("post")
            changed = ~F.col("pre.lsn").eqNullSafe(F.col("post.lsn"))

            # ONE pass over the join (optimization round 13): each
            # joined row yields its 0-2 change rows via a filtered
            # array + explode — the previous four filter+union branches
            # each re-ran the full-outer join (4 join executions per
            # micro-batch for one classification). Same rows, same
            # schema; only the (irrelevant) row order of the feed
            # parquet differs.
            def change(side: str, ctype: str, cond):
                return F.when(
                    cond,
                    F.struct(
                        *[F.col(f"{side}.{c}").alias(c) for c in cols],
                        F.lit(ctype).alias("_change_type"),
                    ),
                )

            changes = j.select(
                F.explode(
                    F.filter(
                        F.array(
                            change(
                                "post", "insert",
                                ~pre_live & post_live & changed,
                            ),
                            change(
                                "pre", "delete",
                                pre_live & ~post_live & changed,
                            ),
                            change(
                                "pre", "update_preimage",
                                pre_live & post_live & changed,
                            ),
                            change(
                                "post", "update_postimage",
                                pre_live & post_live & changed,
                            ),
                        ),
                        lambda x: x.isNotNull(),
                    )
                ).alias("__c")
            ).select("__c.*")
        out = os.path.join(self.feed_root, f"batch_{batch_id}")
        changes.withColumn(
            "_commit_version", F.lit(batch_id)
        ).write.mode("overwrite").parquet(out)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_batch_id": batch_id}, f)
        os.replace(tmp, self._pointer())
