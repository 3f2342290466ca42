"""Semantics of operators/scd.py scd2_apply: change suppression,
multi-change ordering, new keys, closed-history pass-through, and the
one-shuffle plan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from kafka_data_explorer_cdc_spark.operators.scd import scd2_apply


def _dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "k int, seg string, valid_from timestamp, valid_to timestamp, "
        "is_current boolean",
    )


def _obs(spark, rows):
    return spark.createDataFrame(rows, "k int, seg string, observed_at timestamp")


T0 = datetime(2023, 1, 1)
T1 = datetime(2024, 2, 1)
T2 = datetime(2024, 3, 1)
T3 = datetime(2024, 4, 1)


def test_scd2_change_closes_and_opens(spark):
    cur = _dim(spark, [(1, "A", T0, None, True)])
    out = scd2_apply(cur, _obs(spark, [(1, "B", T1)]), ["k"], ["seg"])
    rows = {(r.k, r.seg): (r.valid_from, r.valid_to, r.is_current)
            for r in out.collect()}
    assert rows[(1, "A")] == (T0, T1, False)
    assert rows[(1, "B")] == (T1, None, True)


def test_scd2_redelivery_suppressed(spark):
    """An observation equal to the current version must NOT open a new
    version — including transitive A→A→A chains."""
    cur = _dim(spark, [(1, "A", T0, None, True)])
    out = scd2_apply(
        cur, _obs(spark, [(1, "A", T1), (1, "A", T2)]), ["k"], ["seg"]
    )
    got = out.collect()
    assert len(got) == 1
    assert (got[0].seg, got[0].valid_from, got[0].is_current) == ("A", T0, True)


def test_scd2_honest_flip_flop_kept(spark):
    """A→B→A is three real versions (suppression is vs the immediately
    preceding version, not set membership)."""
    cur = _dim(spark, [(1, "A", T0, None, True)])
    out = scd2_apply(
        cur,
        _obs(spark, [(1, "B", T1), (1, "A", T2), (1, "A", T3)]),
        ["k"],
        ["seg"],
    )
    seq = sorted(
        (r.valid_from, r.seg, r.valid_to, r.is_current) for r in out.collect()
    )
    assert [(s[1], s[2], s[3]) for s in seq] == [
        ("A", T1, False), ("B", T2, False), ("A", None, True)
    ]


def test_scd2_new_key_and_passthrough(spark):
    cur = _dim(
        spark,
        [
            (1, "OLD", datetime(2022, 1, 1), T0, False),  # closed history
            (1, "A", T0, None, True),
        ],
    )
    out = scd2_apply(cur, _obs(spark, [(2, "X", T1)]), ["k"], ["seg"])
    rows = {(r.k, r.seg): (r.valid_from, r.valid_to, r.is_current)
            for r in out.collect()}
    assert rows[(1, "OLD")] == (datetime(2022, 1, 1), T0, False)  # untouched
    assert rows[(1, "A")] == (T0, None, True)                     # untouched
    assert rows[(2, "X")] == (T1, None, True)                     # born


def test_scd2_multi_tracked_null_safe(spark):
    """Multiple tracked columns compare null-safely: (A, NULL) →
    (A, NULL) suppressed; (A, NULL) → (A, 5) is a change."""
    cur = spark.createDataFrame(
        [(1, "A", None, T0, None, True)],
        "k int, seg string, tier int, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    obs = spark.createDataFrame(
        [(1, "A", None, T1), (1, "A", 5, T2)],
        "k int, seg string, tier int, observed_at timestamp",
    )
    out = scd2_apply(cur, obs, ["k"], ["seg", "tier"])
    got = sorted((r.valid_from, r.tier, r.is_current) for r in out.collect())
    assert got == [(T0, None, False), (T2, 5, True)]


def test_scd2_single_shuffle_plan(spark, sf_dir):
    """b84: the suppression LAG and the re-window LEAD share ONE
    hashpartitioning(c_custkey) exchange; closed history unions in
    shuffle-free; no Python boundary."""
    from kafka_data_explorer_cdc_spark.queries import REGISTRY

    df = REGISTRY["b84_scd2_dimension_merge"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
