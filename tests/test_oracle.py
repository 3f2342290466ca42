"""Differential tests: every oracle-bearing query in the registry runs in
both Spark and DuckDB on the sf0.001 testdata and must match exactly
(post-canonicalization). This is a local mirror of the driver's t2 gate.
"""

from __future__ import annotations

import pytest

from kafka_data_explorer_cdc_spark.queries import REGISTRY

from .oracle_utils import compare, duckdb_conn

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, con, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    odf = con.execute(q.oracle).df()
    compare(sdf, odf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_compare_flags_tz_aware_oracle_dtype(spark):
    """Regression for the k103 r11 driver failure class: a DuckDB
    TIMESTAMPTZ column (datetime64[us, UTC]) against Spark's naive
    timestamp is a driver schema mismatch even when every value is
    identical — the local mirror must fail it too, not paper over it
    via value canonicalization."""
    import datetime as _dt

    import pandas as pd

    sdf = spark.createDataFrame(
        [(1, _dt.datetime(2020, 1, 2, 3, 4, 5))], "id INT, ts TIMESTAMP"
    )
    naive = pd.DataFrame(
        {"id": [1], "ts": pd.to_datetime(["2020-01-02T03:04:05"])}
    )
    compare(sdf, naive, "tz-regression-naive")  # identical → passes
    tz_aware = naive.assign(ts=naive["ts"].dt.tz_localize("UTC"))
    with pytest.raises(AssertionError, match="dtype mismatch"):
        compare(sdf, tz_aware, "tz-regression-aware")
