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


def test_coverage_freshness_table_not_stale():
    """COVERAGE.md's generated freshness header must agree with the
    CORRECTNESS_r*.json files on disk (tracked or not). Round 6 shipped
    a stale table because the regen tool was never re-run after the
    driver dropped CORRECTNESS_r06.json; this guard skips LOUDLY (not
    fails — a new driver drop mid-round must not break green) with the
    exact command to run."""
    import glob
    import json
    import re

    import pytest

    checked: set[str] = set()
    for p in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        checked.update(json.load(open(p)).keys())
    from kafka_data_explorer_cdc_spark.queries import REGISTRY

    ever = sum(1 for n in REGISTRY if n in checked)
    never = len(REGISTRY) - ever
    doc = open("/root/repo/COVERAGE.md").read()
    m = re.search(
        r"Registry entries: (\d+); ever driver-checked: (\d+); never: (\d+)",
        doc,
    )
    assert m, "COVERAGE.md freshness header missing — run python tools/coverage_freshness.py"
    got = tuple(int(x) for x in m.groups())
    if got != (len(REGISTRY), ever, never):
        pytest.skip(
            f"COVERAGE.md freshness table STALE: header says {got}, "
            f"disk says {(len(REGISTRY), ever, never)} — "
            "run `python tools/coverage_freshness.py` and commit"
        )
