"""Property-based tests (hypothesis) for the kernels with algebraic
contracts — complementing the per-entry differentials with randomized
invariants. Each Spark-touching property batches its examples into few
jobs (the test_cdc.py pattern); pure-numpy properties run at full
example counts.
"""

from __future__ import annotations

import pytest

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

POLY_MOD = 1_000_000_007


# ---------------------------------------------------------------------------
# pure-python references
# ---------------------------------------------------------------------------


def _poly_ref(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % POLY_MOD
    return h


def _cc_ref(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find with min-label roots — the oracle for any CC impl."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _iir_ref(x: list[float], b: list[float], a: list[float]) -> list[float]:
    """Direct-form recurrence with the SAME association as the JVM
    fold: b-terms accumulated left-to-right, then each a-term
    subtracted SEQUENTIALLY (((nb - w1) - w2), not nb - (w1 + w2)) —
    dyadic taps make the products exact, but three-term addition still
    rounds, so a summed-then-subtracted reference drifts 1 ulp on
    adversarial inputs (hypothesis found one in round 13)."""
    y: list[float] = []
    for i in range(len(x)):
        acc = None
        for j, bj in enumerate(b):
            v = (x[i - j] if i - j >= 0 else 0.0) * bj
            acc = v if acc is None else acc + v
        for j, aj in enumerate(a[1:], start=1):
            acc -= (y[i - j] if i - j >= 0 else 0.0) * aj
        y.append(acc / a[0])
    return y


# ---------------------------------------------------------------------------
# pure-numpy properties — full example counts, no Spark
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=200,
    ),
    cut=st.integers(min_value=0, max_value=200),
    modulus=st.integers(min_value=2, max_value=10_000),
)
@settings(max_examples=60, deadline=None)
def test_property_counter_kernel_split_invariant(vals, cut, modulus):
    """streaming_counter_increase's kernel: ANY batch split of the
    value stream yields the same concatenated (inc, rst) as the
    unsplit fold, and the carried state stays in [0, modulus)."""
    import numpy as np

    from kafka_data_explorer_cdc_spark.streaming.stateful import (
        _counter_increase_kernel,
    )

    arr = np.asarray(vals, dtype="float64")
    cut = min(cut, len(arr))
    one_inc, one_rst, one_total, one_last = _counter_increase_kernel(
        arr, 0, 0, 0, modulus
    )
    parts_inc, parts_rst = [], []
    total = last = seen = 0
    for chunk in (arr[:cut], arr[cut:]):
        if not len(chunk):
            continue
        inc, rst, total, last = _counter_increase_kernel(
            chunk, total, last, seen, modulus
        )
        seen = 1
        parts_inc.append(inc)
        parts_rst.append(rst)
        assert 0 <= total < modulus
    assert np.array_equal(one_inc, np.concatenate(parts_inc))
    assert np.array_equal(one_rst, np.concatenate(parts_rst))
    assert (one_total, one_last) == (total, last)


@given(
    ranks=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1_000),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=300,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=300), max_size=4),
    k=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=60, deadline=None)
def test_property_bottomk_merge_split_invariant(ranks, cuts, k):
    """s61's algebra: folding min-k over ANY partitioning of the
    stream equals the global min-k (min-k of a union is associative
    and commutative)."""
    want = sorted(ranks)[:k]
    bounds = sorted({min(c, len(ranks)) for c in cuts} | {0, len(ranks)})
    state: list[tuple[int, int]] = []
    for lo, hi in zip(bounds, bounds[1:]):
        state = sorted(state + ranks[lo:hi])[:k]
    assert state == want


# ---------------------------------------------------------------------------
# Spark-backed properties — few examples, batched work per example
# ---------------------------------------------------------------------------


@given(
    data=st.data(),
    n_edges=st.integers(min_value=1, max_value=40),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_connected_components_vs_union_find(spark, data, n_edges):
    """connected_components (min-label propagation + adaptive pointer
    jumping) equals union-find on ANY random graph — including long
    chains that engage the jump path and shapes that don't."""
    from kafka_data_explorer_cdc_spark.operators.graph import (
        connected_components,
    )

    node = st.integers(min_value=0, max_value=25)
    edges = [
        (data.draw(node), data.draw(node)) for _ in range(n_edges)
    ]
    # a long chain to force the deep-diameter (pointer-jump) path
    edges += [(100 + i, 101 + i) for i in range(12)]
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        edges = [(0, 1)]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {
        r["id"]: r["comp"] for r in connected_components(df).collect()
    }
    assert got == _cc_ref(edges)


@given(
    xs=st.lists(
        st.floats(min_value=-8.0, max_value=8.0, allow_nan=False),
        min_size=1,
        max_size=24,
    ),
    b=st.lists(
        st.sampled_from([-2.0, -1.0, -0.5, 0.5, 1.0, 2.0]),
        min_size=1,
        max_size=3,
    ),
    a_tail=st.lists(
        st.sampled_from([-0.5, -0.25, 0.0, 0.25, 0.5]),
        max_size=2,
    ),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_series_iir_vs_python_recurrence(spark, xs, b, a_tail):
    """The series_iir JVM fold equals the pure-Python direct-form
    recurrence for ANY series and (dyadic) coefficient sets — the
    reference replays the fold's exact association (see _iir_ref), so
    the comparison is ==, not approx."""
    from kafka_data_explorer_cdc_spark.kql import _series_iir

    import pyspark.sql.functions as F

    a = [1.0] + a_tail
    df = spark.createDataFrame([(xs,)], "x array<double>")
    got = df.select(
        _series_iir(F.col("x"), b, a).alias("y")
    ).first()["y"]
    assert got == _iir_ref(xs, b, a)


@given(
    strings=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=40,
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_poly_hash_portable(spark, strings):
    """The portable rolling hash is IDENTICAL across Spark, DuckDB and
    the pure-Python reference for arbitrary printable-ASCII strings —
    the foundation every portable-twin oracle (d04x/d06x/s61) stands
    on. One Spark job and one DuckDB query per example."""
    import duckdb

    from kafka_data_explorer_cdc_spark.operators.text import (
        DUCKDB_POLY_HASH,
        poly_hash,
    )

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "i long, s string"
    )
    got_spark = {
        r["i"]: r["h"]
        for r in df.select(
            "i", F.expr(poly_hash("s")).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(strings)))
        + ") v(i, s)",
        strings,
    )
    expr = DUCKDB_POLY_HASH.format(expr="s")
    got_duck = dict(
        con.execute(f"SELECT i, {expr} FROM t").fetchall()
    )
    want = {i: _poly_ref(s) for i, s in enumerate(strings)}
    assert got_spark == want
    assert got_duck == want


def _dist_to_ring(x: float, y: float, ring: list[tuple[float, float]]) -> float:
    """Min planar distance from (x, y) to any ring segment — used to
    exclude boundary points from the reversal-invariance claim (ON the
    boundary, ray-casting verdicts are legitimately arithmetic-order
    dependent; the kernel documents the half-open crossing rule)."""
    best = float("inf")
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        dx, dy = x2 - x1, y2 - y1
        L2 = dx * dx + dy * dy
        t = 0.0 if L2 == 0 else max(
            0.0, min(1.0, ((x - x1) * dx + (y - y1) * dy) / L2)
        )
        px, py = x1 + t * dx, y1 + t * dy
        best = min(best, ((x - px) ** 2 + (y - py) ** 2) ** 0.5)
    return best


def _pip_ref(x: float, y: float, ring: list[tuple[float, float]]) -> bool:
    """Pure-python even-odd crossing reference, written with the SAME
    arithmetic shape as the Spark expression (slope pre-folded)."""
    crossings = 0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        if y1 == y2:
            continue
        if (y1 > y) != (y2 > y) and x < (y - y1) * ((x2 - x1) / (y2 - y1)) + x1:
            crossings += 1
    return crossings % 2 == 1


@given(
    # dyadic-grid coordinates (exact in binary, step 1/8 and 1/16):
    # subnormal/overflow geometry — rings 1e-308 tall, slopes at
    # DBL_MAX — is outside the operator's contract (real polygons are
    # not degenerate slivers) and makes IEEE rounding diverge between
    # otherwise-identical expressions; the grid keeps every slope and
    # intersection well-conditioned while still covering non-convex
    # and self-intersecting rings
    verts=st.lists(
        st.tuples(
            st.integers(min_value=-1344, max_value=1344),
            st.integers(min_value=-672, max_value=672),
        ),
        min_size=3,
        max_size=8,
        unique=True,
    ).map(lambda l: [(a / 8, b / 8) for a, b in l]),
    pts=st.lists(
        st.tuples(
            st.integers(min_value=-2880, max_value=2880),
            st.integers(min_value=-1440, max_value=1440),
        ),
        min_size=1,
        max_size=12,
    ).map(lambda l: [(a / 16, b / 16) for a, b in l]),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_point_in_polygon_vs_reference_and_reversal(
    spark, verts, pts
):
    """geo_point_in_polygon (k111) equals the pure-python even-odd
    reference for ARBITRARY (possibly self-intersecting) closed rings
    — for every point, including boundary points (identical
    arithmetic). Additionally, for points NOT on the boundary (planar
    distance > 1e-6 from every segment) it is invariant under ring
    REVERSAL: the even-odd rule is orientation-free. Boundary points
    are excluded from the reversal claim only — hypothesis found a
    point 1e-313 from a vertex where (y - y1) * slope + x1 rounds
    differently per edge direction, exactly the documented half-open
    boundary behavior. One Spark job per example."""
    from kafka_data_explorer_cdc_spark.kql import _geo_point_in_polygon

    import pyspark.sql.functions as F

    ring = verts + [verts[0]]
    rev = list(reversed(ring))
    df = spark.createDataFrame(pts, "lon double, lat double")
    out = df.select(
        _geo_point_in_polygon(F.col("lon"), F.col("lat"), ring).alias("f"),
        _geo_point_in_polygon(F.col("lon"), F.col("lat"), rev).alias("r"),
    ).collect()
    for (x, y), row in zip(pts, out):
        assert row["f"] == _pip_ref(x, y, ring), (x, y, ring)
        if _dist_to_ring(x, y, ring) > 1e-6:
            assert row["r"] == row["f"], (
                "orientation reversal changed an interior verdict",
                x, y, ring,
            )


@given(
    xs=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False,
            width=32,
        ),
        min_size=1,
        max_size=24,
    ),
    period=st.integers(min_value=1, max_value=6),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_series_seasonal_vs_python_median(spark, xs, period):
    """series_seasonal (k112) equals the pure-python phase-median for
    ANY series and period, including n < period (empty phases null),
    and period=1 yields the constant all-values median. The reference
    replays the same two-middle-pick formula, so == not approx."""
    from kafka_data_explorer_cdc_spark.kql import _series_seasonal

    import pyspark.sql.functions as F

    def med(vals: list[float]) -> float | None:
        if not vals:
            return None
        v = sorted(vals)
        m = len(v)
        return (v[(m + 1) // 2 - 1] + v[m // 2]) / 2.0

    expect = [
        med([x for j, x in enumerate(xs) if j % period == i % period])
        for i in range(len(xs))
    ]
    df = spark.createDataFrame([(xs,)], "x array<double>")
    got = df.select(_series_seasonal(F.col("x"), period).alias("s")).first()[
        "s"
    ]
    assert got == expect, (xs, period)


@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),   # user
            st.integers(min_value=0, max_value=13),  # active day
        ),
        min_size=1,
        max_size=60,
    ),
)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_active_users_degenerates_to_sliding_dcount(spark, days):
    """active_users_count with ActivePeriodsCount=1 (k115) must equal
    sliding_window_counts' Dcount over the collapsed (id, period-start)
    stream — the >=1-periods filter admits any activity, so the two
    plugins compute the same rolling distinct. Algebraic cross-check
    between two independently-written compilers, one Spark job each."""
    import datetime as dt

    from kafka_data_explorer_cdc_spark.kql import kql

    rows = [
        (u, dt.datetime(2024, 3, 1) + dt.timedelta(days=d, hours=7))
        for u, d in days
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    au = kql(
        "T | evaluate active_users_count(user_id, ts,"
        " datetime('2024-03-01'), datetime('2024-03-15'), 3d, 1d, 1, 1d)",
        {"T": df},
    ).collect()
    # collapsed stream: one event per (user, day) at the period START
    collapsed = df.selectExpr(
        "user_id", "date_trunc('DAY', ts) AS ts"
    ).distinct()
    sw = kql(
        "T | evaluate sliding_window_counts(user_id, ts,"
        " datetime('2024-03-01'), datetime('2024-03-15'), 3d, 1d)",
        {"T": collapsed},
    ).collect()
    got = {r["Timeline"]: r["Dcount"] for r in au}
    want = {r["Timeline"]: r["Dcount"] for r in sw}
    assert got == want
