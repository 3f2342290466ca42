"""Central query registry — the declared inventory of SURVEY.md §2.

Each query is registered with:
- a builder ``fn(spark, sf_dir) -> DataFrame`` (the Spark-first plan)
- optionally an ANSI-SQL oracle string DuckDB can run on the same
  parquet tables (views: region nation customer supplier part orders
  lineitem events documents embeddings). ``oracle=None`` marks
  genuinely non-SQL-expressible ops (approximate / stateful) — the
  driver then records a weaker rows-only check and dedicated pytest
  semantic tests cover them instead.

Exactness conventions (so the DuckDB value-hash matches bit-for-bit):
- money aggregates go through DECIMAL(18,2) (order-independent, exact)
  and are cast back to DOUBLE for a stable output schema;
- fold-over-array math uses the same sequential fold on both sides
  (Spark ``aggregate`` vs DuckDB ``list_reduce``) so double rounding
  is identical;
- every computed column is aliased identically in both engines;
- all rankings carry a unique-key tie-breaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query builder (and its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name, fn, oracle, tags, fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
