"""Driver-contract tests for __spark_entry__: the driver may hand
entry()/queries() an arbitrarily-configured session; the adapter must
repin the runtime confs correctness depends on."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as e


def test_entry_repins_utc_on_foreign_session(spark):
    """A session arriving with a non-UTC timezone must be repinned —
    every timestamp oracle comparison assumes UTC."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = e.entry(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        rows = df.collect()
        assert len(rows) > 0
        assert set(df.columns) == {"city", "avg_sales"}
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_queries_and_oracles_are_consistent(spark):
    """Contract invariants: every oracle key has a query; every query
    callable accepts (spark, sf_dir); names are stable identifiers."""
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(n.replace("_", "").isalnum() for n in qs)
    df = qs["b01_scan_region"](spark, "/root/testdata/sf0.001")
    assert df.count() == 5
