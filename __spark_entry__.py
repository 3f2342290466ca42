"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``kafka_data_explorer_cdc_spark.queries`` — the
registry holds every implemented operator from SURVEY.md §2, each with
a Spark builder and (where SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_data_explorer_cdc_spark.queries import oracles as _oracles
from kafka_data_explorer_cdc_spark.queries import queries as _queries
from kafka_data_explorer_cdc_spark.session import configure_runtime


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the full reference ingestion path (envelope → unwrap → mapping)
    feeding the KQL summarize query — the reference's bread and butter.
    """
    configure_runtime(spark)
    return _queries()["a14_avg_sales_by_city"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    wrapped = {}
    for name, fn in _queries().items():
        def make(f):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                configure_runtime(spark)
                # release the PREVIOUS query's compiler caches (KQL
                # materialize()/fork persists outlive their compile by
                # design) so a full-registry driver sweep doesn't
                # accumulate MEMORY_AND_DISK entries across hundreds
                # of queries; the current query's caches stay live
                # until the next call.
                from kafka_data_explorer_cdc_spark.kql import (
                    kql_unpersist_caches,
                )

                kql_unpersist_caches()
                return f(spark, sf_dir)

            return run

        wrapped[name] = make(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return _oracles()
