"""Semantic tests for approximate / non-oracle relational operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_data_explorer_cdc_spark.queries import REGISTRY


def test_approx_count_distinct_within_bound(spark, sf_dir):
    """B8 approx variant: HLL++ at rsd=0.02 must land within 5% of the
    exact recount (FIXTURES.md: approx ops are checked by threshold,
    never hash-equality)."""
    from kafka_data_explorer_cdc_spark.queries.relational import (
        approx_distinct_by_flag,
    )

    approx = {
        r["l_returnflag"]: r["n_orders_approx"]
        for r in approx_distinct_by_flag(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n_orders"]
        for r in REGISTRY["b08_count_distinct"].fn(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        assert abs(est - exact[flag]) / exact[flag] < 0.05, (flag, est, exact[flag])
    # and the gate form (boolean bounded-comparison) is all-true
    rows = REGISTRY["b08x_approx_count_distinct"].fn(spark, sf_dir).collect()
    assert rows and all(r["within_5pct"] for r in rows)


def test_salted_join_matches_plain_join(spark, sf_dir):
    """salted_join must be row-identical to the plain equi-join."""
    from kafka_data_explorer_cdc_spark.io import load
    from kafka_data_explorer_cdc_spark.operators.skew import salted_join

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    c = c.withColumnRenamed("c_custkey", "o_custkey")
    plain = sorted(
        tuple(r) for r in o.join(c, "o_custkey").collect()
    )
    salted = sorted(
        tuple(r) for r in salted_join(o, c, "o_custkey", buckets=8).collect()
    )
    assert salted == plain


def test_asof_join_semantics(spark):
    """Inclusive match at equal ts; latest-at-or-before wins; 'left'
    keeps unmatched rows, 'inner' drops them."""
    from kafka_data_explorer_cdc_spark.operators.asof import asof_join

    quotes = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 101.0), (2, 15, 50.0)],
        "sym int, ts int, px double",
    )
    trades = spark.createDataFrame(
        [(1, 9, "early"), (1, 10, "attime"), (1, 25, "late"), (3, 5, "nokey")],
        "sym int, ts int, tag string",
    )
    out = {
        (r["sym"], r["ts"]): r["asof_px"]
        for r in asof_join(
            trades, quotes, ["sym"], "ts", ["px"], how="left"
        ).collect()
    }
    assert out[(1, 9)] is None          # before any quote
    assert out[(1, 10)] == 100.0        # inclusive at equal ts
    assert out[(1, 25)] == 101.0        # latest at-or-before
    assert out[(3, 5)] is None          # unmatched key kept by 'left'
    inner = asof_join(trades, quotes, ["sym"], "ts", ["px"], how="inner")
    assert inner.count() == 2


def test_approx_percentiles_bounded_error(spark, sf_dir):
    """b27x (Greenwald-Khanna sketch) must track the exact b27 within a
    tight relative bound at accuracy=10000 — the invariant that makes it
    a safe drop-in for the exact aggregate at scale."""
    from kafka_data_explorer_cdc_spark.queries import REGISTRY
    from kafka_data_explorer_cdc_spark.queries.relational import (
        approx_percentiles_by_flag,
    )

    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"], r["p99"])
        for r in REGISTRY["b27_percentiles"].fn(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: (r["p50"], r["p95"], r["p99"])
        for r in approx_percentiles_by_flag(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, ex in exact.items():
        for e, a in zip(ex, approx[flag]):
            assert abs(a - e) / e < 0.01, (flag, e, a)
    # and the gate form (boolean bounded-comparison) is all-true
    rows = REGISTRY["b27x_percentiles_approx"].fn(spark, sf_dir).collect()
    assert rows and all(
        r["p50_ok"] and r["p95_ok"] and r["p99_ok"] for r in rows
    )


def test_expectations_audit_semantics(spark):
    """operators/expectations.py: each rule kind counts its violations,
    unique counts duplicates AND null keys, names must be distinct."""
    import pytest
    from pyspark.sql import functions as F

    from kafka_data_explorer_cdc_spark.operators.expectations import (
        accepted_values,
        audit,
        in_range,
        matches,
        not_null,
        unique,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (2, None, 50.0),
            (2, "c", -1.0),
            (None, "dd", 7.0),
        ],
        "k int, tag string, val double",
    )
    rep = {
        r.rule: (r.rows, r.violations, r.passed)
        for r in audit(
            df,
            [
                not_null("tag"),
                in_range("val", 0, 10),
                matches("tag", "^[a-c]$"),
                accepted_values("tag", ["a", "c"]),
                unique(["k"]),
            ],
        ).collect()
    }
    assert rep["not_null(tag)"] == (4, 1, False)
    assert rep["in_range(val,0,10)"] == (4, 2, False)      # 50.0, -1.0
    assert rep["matches(tag)"] == (4, 2, False)            # None, "dd"
    assert rep["accepted_values(tag)"] == (4, 2, False)    # None, "dd"
    # k: one dup pair (2,2) = 1 excess row, one NULL key = 1 more
    assert rep["unique(k)"] == (4, 2, False)

    clean = audit(df.filter(F.col("k") == 1), [not_null("k")])
    assert clean.collect()[0].passed is True

    with pytest.raises(ValueError, match="duplicate"):
        audit(df, [not_null("k"), not_null("k")])
    with pytest.raises(ValueError, match="at least one"):
        audit(df, [])


def test_interval_join_non_day_bucket(spark):
    """Round-8 advisor finding: with bucket='2 days' the old
    date_trunc('DAY') point grid disagreed with the stepped interval
    grid and dropped true matches. Both sides now bucket on the same
    epoch-quotient grid, so every width gives identical results."""
    from kafka_data_explorer_cdc_spark.operators.interval import (
        interval_point_join,
    )

    pts = spark.createDataFrame(
        [("p1", "2024-01-04 12:00:00"), ("p2", "2024-01-09 01:00:00"),
         ("p3", "2023-12-31 23:59:59")],
        "pid string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    iv = spark.createDataFrame(
        [("w1", "2024-01-03 06:00:00", "2024-01-05 06:00:00"),
         ("w2", "2024-01-01 00:00:00", "2024-01-10 00:00:00")],
        "wid string, s string, e string",
    ).withColumn("s", F.to_timestamp("s")).withColumn(
        "e", F.to_timestamp("e")
    )
    expected = {("p1", "w1"), ("p1", "w2"), ("p2", "w2")}
    for bucket in ["1 day", "2 days", "12 hours", "1 week", "90 minutes"]:
        got = {
            (r.pid, r.wid)
            for r in interval_point_join(
                pts, iv, "ts", "s", "e", bucket=bucket
            ).collect()
        }
        assert got == expected, f"bucket={bucket}: {got}"
    import pytest

    with pytest.raises(ValueError, match="fixed-width"):
        interval_point_join(pts, iv, "ts", "s", "e", bucket="1 month")


def test_row_id_bit_extraction_exact_at_high_ordinals(spark):
    """Round-8 advisor finding: float division (mid / 2^33) rounds in
    the 53-bit double mantissa once the partition ordinal meets a full
    33-bit counter, landing rows in the wrong partition offset. The
    fixed extraction (shiftrightunsigned / bitwiseAND) must agree with
    exact Python integer arithmetic at the hostile corners."""
    corners = []
    for pid in [0, 1, 2**19, 2**20 - 1, 2**20, 2**27]:
        for lrn in [0, 1, 2**33 - 1, 2**33 - 2, 2**32 + 12345]:
            corners.append(((pid << 33) | lrn, pid, lrn))
    df = spark.createDataFrame(
        [(m,) for m, _, _ in corners], "__mid long"
    ).select(
        "__mid",
        F.shiftrightunsigned(F.col("__mid"), 33).alias("pid"),
        F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)).alias("lrn"),
    )
    got = {r["__mid"]: (r["pid"], r["lrn"]) for r in df.collect()}
    for mid, pid, lrn in corners:
        assert got[mid] == (pid, lrn), (mid, got[mid], (pid, lrn))


def test_b119_weights_sum_to_value(spark):
    """Attribution conservation: every purchase with >=1 touch must
    distribute EXACTLY its value (U-shape weights sum to 1 for every
    path length), pinned on planted paths of length 1, 2, 3 and 5."""
    import datetime as dt
    import os
    import tempfile

    from pyspark.sql import functions as F

    from kafka_data_explorer_cdc_spark.queries import REGISTRY

    t0 = dt.datetime(2024, 1, 10)
    rows, eid = [], 0

    def add(u, et, mins, val=0.0):
        nonlocal eid
        rows.append((eid, t0 + dt.timedelta(minutes=mins), u, et, val, "{}"))
        eid += 1

    # user 1: path of 1 view -> purchase 100
    add(1, "view", 0); add(1, "purchase", 10, 100.0)
    # user 2: 2 touches -> purchase 100
    add(2, "view", 0); add(2, "click", 1); add(2, "purchase", 10, 100.0)
    # user 3: 3 touches
    add(3, "view", 0); add(3, "click", 1); add(3, "signup", 2)
    add(3, "purchase", 10, 100.0)
    # user 4: 5 touches
    for i in range(5):
        add(4, "click", i)
    add(4, "purchase", 10, 100.0)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp(prefix="attr_")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    out = REGISTRY["b119_multitouch_attribution"].fn(spark, d).collect()
    total = sum(r["credited_value"] for r in out)
    assert abs(total - 400.0) < 1e-6  # conservation across all paths
    by_ch = {r["channel"]: r["credited_value"] for r in out}
    # user1 view 100; user2 view 50; user3 view 40 (first)
    assert abs(by_ch["view"] - 190.0) < 1e-6
    # user3 signup 40 (last)
    assert abs(by_ch["signup"] - 40.0) < 1e-6
    # clicks: u2 50 + u3 20 (middle) + u4 100
    assert abs(by_ch["click"] - 170.0) < 1e-6
