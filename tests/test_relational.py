"""Semantic tests for approximate / non-oracle relational operators."""

from __future__ import annotations

from kafka_data_explorer_cdc_spark.queries import REGISTRY


def test_approx_count_distinct_within_bound(spark, sf_dir):
    """B8 approx variant: HLL++ at rsd=0.02 must land within 5% of the
    exact recount (FIXTURES.md: approx ops are checked by threshold,
    never hash-equality)."""
    approx = {
        r["l_returnflag"]: r["n_orders_approx"]
        for r in REGISTRY["b08x_approx_count_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n_orders"]
        for r in REGISTRY["b08_count_distinct"].fn(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        assert abs(est - exact[flag]) / exact[flag] < 0.05, (flag, est, exact[flag])
