"""Bloom-filter semi-join reduction (operators/bloom.py): the no-false-
negative guarantee, the false-positive bound that makes the prefilter
worth its broadcast, and the JVM-only hot path."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from kafka_data_explorer_cdc_spark.io import load
from kafka_data_explorer_cdc_spark.operators.bloom import (
    bloom_params,
    bloom_semi_join,
    build_bloom,
    might_contain,
)


def test_bloom_params_standard_bounds():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0
    assert 9000 <= m <= 10100  # ~9.6 bits/item at 1% fpp
    assert 6 <= k <= 8


def test_no_false_negatives_and_bounded_false_positives(spark):
    """Every member key must pass the filter (hard guarantee); the
    non-member pass rate must track the configured fpp (1% target,
    asserted loosely at <5% to stay robust to hash quirks)."""
    members = spark.range(0, 2000).select((F.col("id") * 7919).alias("key"))
    m, k = bloom_params(2000, 0.01)
    bitmap = build_bloom(members, "key", m, k)
    probe = spark.range(0, 20000).select(
        (F.col("id") * 7919).alias("key"),  # first 2000 are members
    )
    hits = (
        probe.crossJoin(broadcast(bitmap))
        .select(
            "key",
            might_contain(F.col("key"), F.col("__bloom"), m, k).alias("hit"),
            (F.col("key") < 2000 * 7919).alias("member"),
        )
    )
    row = hits.agg(
        F.sum(F.when(F.col("member") & ~F.col("hit"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("member") & F.col("hit"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("member"), 1).otherwise(0)).alias("nonmembers"),
    ).collect()[0]
    assert row["fn"] == 0, "false negative: Bloom guarantee broken"
    assert row["fp"] / row["nonmembers"] < 0.05, row


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    risky = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    got = bloom_semi_join(ev, risky, "user_id", "c_custkey")
    want = ev.join(
        risky.select("c_custkey"), ev.user_id == F.col("c_custkey"), "left_semi"
    )
    assert got.count() == want.count()
    assert got.select("event_id").exceptAll(want.select("event_id")).count() == 0


def test_bloom_prefilter_actually_reduces(spark, sf_dir):
    """The point of the operator: the prefilter alone (before the
    confirm join) must drop nearly all non-matching rows — measured,
    not assumed."""
    ev = load(spark, sf_dir, "events")
    risky = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    from kafka_data_explorer_cdc_spark.operators.bloom import bloom_params

    n = risky.count()
    m, k = bloom_params(n, 0.01)
    bitmap = build_bloom(risky, "c_custkey", m, k)
    pre = (
        ev.crossJoin(broadcast(bitmap))
        .filter(might_contain(F.col("user_id"), F.col("__bloom"), m, k))
        .count()
    )
    exact = ev.join(
        risky.select("c_custkey"), ev.user_id == F.col("c_custkey"), "left_semi"
    ).count()
    total = ev.count()
    # prefilter keeps all true matches plus at most a few % of the rest
    assert exact <= pre <= exact + 0.05 * (total - exact) + 10


def test_bloom_path_is_jvm_only(spark, sf_dir):
    """No Python evaluation anywhere in the probe plan — the filter
    must run inside whole-stage codegen at the scan."""
    ev = load(spark, sf_dir, "events")
    risky = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    df = bloom_semi_join(ev, risky, "user_id", "c_custkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # the confirm join broadcasts


def test_bloom_semi_join_same_key_name(spark, sf_dir):
    """big_key == small_key must not trip column-reference ambiguity."""
    ev = load(spark, sf_dir, "events")
    sub = ev.filter(F.col("value") > 45).select("user_id")
    got = bloom_semi_join(ev, sub, "user_id", "user_id")
    want = ev.join(sub.distinct(), "user_id", "left_semi")
    assert got.count() == want.count() > 0
