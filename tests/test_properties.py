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
    y: list[float] = []
    for i in range(len(x)):
        acc = sum(
            bj * (x[i - j] if i - j >= 0 else 0.0) for j, bj in enumerate(b)
        )
        acc -= sum(
            aj * (y[i - j] if i - j >= 0 else 0.0)
            for j, aj in enumerate(a[1:], start=1)
        )
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
    recurrence for ANY series and (dyadic) coefficient sets — dyadic
    taps keep both sides exact in binary so the comparison is ==,
    not approx."""
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
