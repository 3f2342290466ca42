"""The streaming CDC ingestion pipeline — the Spark redesign of the
reference's Debezium→Kafka→Connect→ADX path (SURVEY.md §3.1):

reference (five containers)                 this engine (one streaming query)
---------------------------                 ---------------------------------
Kafka topic of JSON envelopes           →   readStream (kafka | file)
JsonConverter per-record schema         →   from_json(ENVELOPE_SCHEMA)
ExtractNewRecordState SMT               →   unwrap(): payload.after.* projection
flush.size/interval batching            →   micro-batch trigger interval
Connect offset topics (at-least-once)   →   checkpointLocation (exact offsets)
Kusto batched ingest + table            →   foreachBatch idempotent merge → parquet
                                            (Delta/Iceberg MERGE in production)

The at-least-once → effectively-exactly-once upgrade happens in
``apply_cdc_batch``: the merge is keyed and lsn-arbitrated, so replayed
micro-batches (checkpoint recovery, duplicate delivery) cannot change
state (SURVEY.md §7 hard parts; tests/test_cdc.py proves idempotence).

State storage here is versioned parquet (``state/v{batch_id}``) because
this environment has no transactional table format; each version is
written before the pointer advances, never rewritten in place. On a
cluster the foreachBatch body becomes a Delta ``MERGE INTO`` and the
versioning collapses into the table's own log.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..cdc.apply import apply_cdc_batch
from ..cdc.envelope import parse_envelope, unwrap


def read_kafka_envelopes(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "myserver.inventory.orders_info",
) -> DataFrame:
    """Kafka source — the production path (reference topic naming,
    ``README.md:259``). Requires the spark-sql-kafka package on the
    cluster; not exercised in this container (no broker)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    return unwrap(parse_envelope(raw))


def write_kafka_envelopes(
    envelopes: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    trigger_seconds: int = 30,
):
    """Kafka sink — publish (key, value) envelope rows back to a topic
    (the engine as a CDC *producer*, e.g. re-emitting enriched or
    filtered change streams). Expects the ``to_envelope_json`` shape:
    string ``key``, JSON string ``value``. Exactly-once is inherited
    from the checkpoint + Kafka's idempotent producer; not exercised in
    this container (no broker) — construction-tested only."""
    return (
        envelopes.selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )


def read_file_envelopes(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-based envelope stream: one JSON envelope per line — the
    test/replay path (a Kafka topic dump is exactly this shape). Carries
    the raw line through for dead-lettering."""
    raw = spark.readStream.format("text").load(input_dir)
    return unwrap(parse_envelope(raw, value_col="value"), keep_raw=True)


def flatten_after(flat: DataFrame) -> DataFrame:
    """After-image + CDC metadata as flat columns, keyed for the merge.
    Deletes carry their key in the before-image (README.md:268-288)."""
    cols = [
        F.coalesce(F.col("after.orderid"), F.col("before.orderid")).alias("orderid"),
        F.col("after.custid").alias("custid"),
        F.col("after.amount").alias("amount"),
        F.col("after.city").alias("city"),
        "op",
        "lsn",
    ]
    if "raw_value" in flat.columns:
        cols.append("raw_value")
    return flat.select(*cols)


class ParquetStateSink:
    """foreachBatch target: versioned-parquet latest-state store.

    Malformed envelopes (unparseable JSON, or parseable but keyless /
    sequence-less) never reach the merge: they are appended losslessly
    to a dead-letter parquet under ``state_root/dead_letter`` for
    inspection and replay — the DLQ every production CDC sink needs,
    since ``from_json`` nulls corrupt records instead of failing."""

    def __init__(self, spark: SparkSession, state_root: str, key_cols: list[str]):
        self.spark = spark
        self.root = state_root
        self.key_cols = key_cols
        os.makedirs(state_root, exist_ok=True)

    def dead_letter_dir(self) -> str:
        return os.path.join(self.root, "dead_letter")

    def dead_letters(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.dead_letter_dir())
        except Exception:
            return None

    def _pointer(self) -> str:
        return os.path.join(self.root, "LATEST")

    def current(self) -> DataFrame | None:
        try:
            with open(self._pointer()) as f:
                version = json.load(f)["version"]
        except FileNotFoundError:
            return None
        return self.at_version(version)

    def versions(self) -> list[int]:
        """All retained state versions, oldest first — each ``v{n}`` dir
        is an immutable snapshot after micro-batch ``n`` (the poor
        man's Delta log; on a transactional format this is the table
        history)."""
        return sorted(
            int(d[1:])
            for d in os.listdir(self.root)
            if d.startswith("v") and d[1:].isdigit()
        )

    def at_version(self, version: int) -> DataFrame:
        """Time travel: state as of micro-batch ``version``."""
        return self.spark.read.parquet(os.path.join(self.root, f"v{version}"))

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        bad_cond = F.col(self.key_cols[0]).isNull() | F.col("lsn").isNull()
        if "raw_value" in batch.columns:
            bad = batch.filter(bad_cond).select(
                F.lit(batch_id).alias("batch_id"), "raw_value"
            )
            # append is idempotent-enough for a DLQ (duplicates on batch
            # replay are acceptable there; the MERGE path stays exact)
            bad.write.mode("append").parquet(self.dead_letter_dir())
            batch = batch.filter(~bad_cond).drop("raw_value")
        else:
            batch = batch.filter(~bad_cond)
        merged = apply_cdc_batch(self.current(), batch, self.key_cols)
        out = os.path.join(self.root, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": batch_id}, f)
        os.replace(tmp, self._pointer())


def start_cdc_pipeline(
    spark: SparkSession,
    input_dir: str,
    state_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    trigger_seconds: int = 30,
) -> StreamingQuery:
    """Wire the full pipeline. ``trigger_seconds=30`` mirrors the
    reference's flush.interval.ms (``adx-sink-config.json:6``);
    ``available_now`` drains the backlog and stops (test/replay mode).
    """
    sink = ParquetStateSink(spark, state_root, ["orderid"])
    flat = flatten_after(read_file_envelopes(spark, input_dir))
    writer = flat.writeStream.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.foreachBatch(sink.apply_batch).start()
