"""A first-class CDC-envelope *connector* via Spark 4's Python Data
Source API — the reference's source-connector role (Debezium→Kafka,
`pg-source-config.json`) as a pluggable Spark source instead of a
loader helper.

``spark.dataSource.register(CdcEnvelopeDataSource)`` then::

    spark.read.format("cdc_envelopes").load(dir)        # batch
    spark.readStream.format("cdc_envelopes").load(dir)  # tail the "topic"

Schema mirrors a Kafka topic dump plus provenance metadata columns
(the connector equivalent of Kafka's partition/offset columns):
``value`` (the envelope JSON line), ``src_file``, ``line_no``.
Downstream is the existing pipeline unchanged: ``parse_envelope`` →
``unwrap`` → merge.

Scale/execution design:

- **batch**: one ``InputPartition`` per file — files scan in parallel
  across executors, no driver materialization; rows stream out of a
  generator (never a list).
- **streaming**: a :class:`SimpleDataSourceStreamReader` whose offset
  is ``{"files_done": n}`` over the sorted file list — new files
  appended to the directory are picked up next micro-batch, exactly
  the Kafka-tail semantics the file replay models. Offsets commit
  through the normal checkpoint, so restart/replay goes through the
  sink's idempotent merge like any other source.

(The Python worker boundary costs one serialization hop vs the JVM
text source — this connector is the *extensibility* story: the same
API shape would wrap a REST paginator, a proprietary binlog, or any
system without a JVM connector.)
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "value string, src_file string, line_no bigint"


def _list_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if not f.startswith(("_", "."))
        and os.path.isfile(os.path.join(path, f))
    )


def _read_lines(path: str) -> Iterator[tuple]:
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            line = line.rstrip("\n")
            if line:
                yield (line, os.path.basename(path), i)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CdcEnvelopeBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_envelopes: .load(path) is required")

    def partitions(self):
        return [_FilePartition(p) for p in _list_files(self.path)]

    def read(self, partition: _FilePartition):
        yield from _read_lines(partition.path)


class CdcEnvelopeStreamReader(SimpleDataSourceStreamReader):
    """File-granularity tail: each micro-batch drains every file not
    yet consumed (sorted order = arrival order in the replay model)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_envelopes: .load(path) is required")

    def initialOffset(self) -> dict:
        return {"files_done": 0}

    def read(self, start: dict):
        files = _list_files(self.path)
        done = start["files_done"]
        # materialized (not a generator): the simple-reader API caches
        # the prefetched batch driver-side for replay and must copy it;
        # bounded by the files drained this micro-batch. The partition-
        # parallel batch reader is the bulk path; this reader is the
        # tail path.
        rows = [r for p in files[done:] for r in _read_lines(p)]
        return rows, {"files_done": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: deterministic because the file list is
        # sorted and files are immutable once written
        files = _list_files(self.path)[start["files_done"]: end["files_done"]]
        for p in files:
            yield from _read_lines(p)


class CdcEnvelopeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_envelopes"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return CdcEnvelopeBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return CdcEnvelopeStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(CdcEnvelopeDataSource)
