"""Z-order layout (operators/layout.py) and CMS (operators/cms.py)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kafka_data_explorer_cdc_spark.io import load
from kafka_data_explorer_cdc_spark.operators import cms as CMS
from kafka_data_explorer_cdc_spark.operators import layout as L


def test_interleave_bits_known_values(spark):
    """Hand-checked z-values: interleave of (x, y) with 2-bit inputs.
    Bit j of dim c lands at position j*2 + c, so (x=0b11, y=0b00) ->
    0b0101 = 5 and (x=0b00, y=0b11) -> 0b1010 = 10; the curve orders
    (0,0) < (1,0) < (0,1) < (1,1) within each 2x2 tile."""
    df = spark.createDataFrame(
        [(3, 0), (0, 3), (1, 1), (2, 2)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y",
            L.interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z"),
        ).collect()
    }
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(1, 1)] == 0b0011
    assert got[(2, 2)] == 0b1100


def test_zorder_write_lossless_and_clusters_files(spark, sf_dir, tmp_path):
    """(1) The layout pass is a pure reorder — reading the z-ordered
    copy returns exactly the original rows. (2) Files are clustered:
    for a predicate covering ~10% of the user_id range, only a
    minority of files' [min, max] user_id spans intersect it, while a
    layout sorted on an uncorrelated key (event_id) leaves EVERY file
    spanning the predicate — that per-file tightness is what parquet
    min/max pruning consumes via the pushed-down filters."""
    ev = load(spark, sf_dir, "events")
    zdir = str(tmp_path / "z")
    L.zorder_write(ev, zdir, ["user_id", "ts"], num_files=8)
    z = spark.read.parquet(zdir)
    assert z.count() == ev.count()
    assert (
        z.select("event_id").exceptAll(ev.select("event_id")).count() == 0
    )
    assert sorted(z.columns) == sorted(ev.columns)

    # linear control: same file count, sorted on an uncorrelated key
    ldir = str(tmp_path / "linear")
    (
        ev.repartitionByRange(8, "event_id")
        .sortWithinPartitions("event_id")
        .write.parquet(ldir)
    )

    lo, hi = 0, int(ev.agg(F.max("user_id")).first()[0] * 0.1)

    def spanning_files(d: str) -> tuple[int, int]:
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            ci = idx["user_id"]
            fmin = min(
                md.row_group(g).column(ci).statistics.min
                for g in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(g).column(ci).statistics.max
                for g in range(md.num_row_groups)
            )
            if fmin <= hi and fmax >= lo:
                hit += 1
        return hit, len(files)

    z_hit, z_total = spanning_files(zdir)
    l_hit, l_total = spanning_files(ldir)
    assert z_total >= 4 and l_total >= 4
    assert l_hit == l_total, "control layout should have no tight files"
    assert z_hit <= z_total // 2, (
        f"z-order should confine the predicate to a minority of files: "
        f"{z_hit}/{z_total}"
    )

    # and the range predicates actually reach the scan as PushedFilters
    p = (
        z.filter((F.col("user_id") <= hi) & (F.col("user_id") >= lo))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in p and "user_id" in p.split("PushedFilters")[1][:200]


def test_cms_guarantees_and_merge(spark, sf_dir):
    """CMS: estimate >= exact for every key (one-sided, deterministic);
    estimates within eps*N; merging parity-split sketches reproduces
    the full sketch cell-for-cell; estimate of an UNSEEN key is bounded
    by collisions only."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    width, depth = 256, 4
    sk = CMS.cms_build(orders, "o_custkey", width, depth)
    exact = orders.groupBy("o_custkey").agg(F.count("*").alias("exact"))
    est = CMS.cms_estimate(sk, exact, "o_custkey", width, depth)
    both = exact.join(est, "o_custkey").collect()
    n = orders.count()
    assert both
    for r in both:
        assert r["est"] >= r["exact"], r
        assert r["est"] <= r["exact"] + 4.0 * n / width, r
    halves = [
        CMS.cms_build(orders.filter(F.col("o_orderkey") % 2 == i),
                      "o_custkey", width, depth)
        for i in (0, 1)
    ]
    merged = CMS.cms_merge(*halves)
    diff = (
        sk.withColumnRenamed("cnt", "a")
        .join(merged.withColumnRenamed("cnt", "b"), ["d", "bucket"], "full")
        .filter(F.coalesce("a", F.lit(0)) != F.coalesce("b", F.lit(0)))
    )
    assert diff.count() == 0
    # sketch size is bounded by the grid, never the data
    assert sk.count() <= width * depth


def test_cms_weighted(spark):
    """Weighted build sums a measure instead of counting rows."""
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 1)], "k string, w int"
    )
    sk = CMS.cms_build(df, "k", width=64, depth=3, weight="w")
    est = {
        r["k"]: r["est"]
        for r in CMS.cms_estimate(
            sk, df.select("k").distinct(), "k", width=64, depth=3
        ).collect()
    }
    assert est["a"] >= 15 and est["b"] >= 1
