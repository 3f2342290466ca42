"""Semantics of operators/merge.py — Delta MERGE algebra on DataFrames:
clause ordering, null-key isolation, insert defaults, the cardinality
guard, and the one-join physical shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_data_explorer_cdc_spark.operators.merge import (
    MatchedClause,
    MergeCardinalityError,
    merge_into,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (None, "z", 99.0)],
        "k int, tag string, val double",
    )


def test_merge_update_delete_insert_keep(spark):
    """One statement: k=1 updated, k=2 deleted, k=9 inserted, k=3 and
    the null-key row untouched; first-match-wins clause order."""
    src = spark.createDataFrame(
        [(1, 11.0, False), (2, None, True), (9, 90.0, False)],
        "k int, newval double, cancel boolean",
    )
    out = merge_into(
        _target(spark),
        src,
        ["k"],
        matched=[
            MatchedClause("delete", condition=F.col("__s.cancel")),
            MatchedClause("update", set_map={"val": F.col("__s.newval")}),
        ],
        insert_map={"tag": F.lit("new"), "val": F.col("__s.newval")},
    )
    assert out.columns == ["k", "tag", "val"]
    got = {(r.k, r.tag, r.val) for r in out.collect()}
    assert got == {
        (1, "a", 11.0),      # updated
        (3, "c", 30.0),      # kept (no source partner)
        (None, "z", 99.0),   # null key never matches, survives
        (9, "new", 90.0),    # inserted
    }


def test_merge_first_match_wins_clause_order(spark):
    """A row satisfying BOTH clauses takes the first one declared —
    swap the declaration order, get the other outcome."""
    src = spark.createDataFrame([(1, 111.0, True)], "k int, newval double, cancel boolean")
    update_first = merge_into(
        _target(spark), src, ["k"],
        matched=[
            MatchedClause("update", set_map={"val": F.col("__s.newval")}),
            MatchedClause("delete", condition=F.col("__s.cancel")),
        ],
    )
    assert {(r.k, r.val) for r in update_first.collect()} == {
        (1, 111.0), (2, 20.0), (3, 30.0), (None, 99.0)
    }
    delete_first = merge_into(
        _target(spark), src, ["k"],
        matched=[
            MatchedClause("delete", condition=F.col("__s.cancel")),
            MatchedClause("update", set_map={"val": F.col("__s.newval")}),
        ],
    )
    assert {r.k for r in delete_first.collect()} == {2, 3, None}


def test_merge_insert_defaults_and_gating(spark):
    """Default insert copies same-named source columns and NULL-fills
    the rest; not_matched_condition gates which source rows insert;
    insert_when_not_matched=False discards them all."""
    src = spark.createDataFrame(
        [(8, 80.0), (9, 90.0)], "k int, val double"
    )
    out = merge_into(
        _target(spark), src, ["k"],
        not_matched_condition=F.col("__s.val") > 85.0,
    )
    got = {(r.k, r.tag, r.val) for r in out.collect()}
    assert (9, None, 90.0) in got and not any(r[0] == 8 for r in got)

    none_inserted = merge_into(
        _target(spark), src, ["k"], insert_when_not_matched=False
    )
    assert {r.k for r in none_inserted.collect()} == {1, 2, 3, None}


def test_merge_cardinality_guard(spark):
    """Duplicate source keys raise (stricter than Delta — documented);
    check_cardinality=False lets a known-unique caller skip the scan."""
    dup = spark.createDataFrame(
        [(1, 11.0), (1, 12.0)], "k int, newval double"
    )
    with pytest.raises(MergeCardinalityError, match=r"\(1,\)"):
        merge_into(
            _target(spark), dup, ["k"],
            matched=[MatchedClause("update", set_map={"val": F.col("__s.newval")})],
        )
    # with the guard off the statement still runs (outcome per-key
    # nondeterministic for the dup — caller asserted uniqueness)
    out = merge_into(
        _target(spark), dup.limit(1), ["k"],
        matched=[MatchedClause("update", set_map={"val": F.col("__s.newval")})],
        check_cardinality=False,
    )
    assert out.count() == 4


def test_merge_clause_validation(spark):
    with pytest.raises(ValueError, match="SET map"):
        MatchedClause("update")
    with pytest.raises(ValueError, match="no SET map"):
        MatchedClause("delete", set_map={"val": F.lit(1)})
    with pytest.raises(ValueError, match="unknown MERGE action"):
        MatchedClause("upsert")


def test_merge_single_join_plan(spark, sf_dir):
    """The MERGE itself is ONE full-outer SortMergeJoin — no second
    join, no Python boundary, no window — so each side pays exactly one
    hash-partitioned exchange on the merge key."""
    from kafka_data_explorer_cdc_spark.io import load

    o = load(spark, sf_dir, "orders")
    src = o.select(
        "o_orderkey", (F.col("o_totalprice") + 1.0).alias("p")
    ).filter(F.col("o_orderkey") % 5 == 0)
    out = merge_into(
        o, src, ["o_orderkey"],
        matched=[MatchedClause("update", set_map={"o_totalprice": F.col("__s.p")})],
        check_cardinality=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") == 1 and "FullOuter" in plan
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
