"""CDC-replay tests (SURVEY.md §5.2): a deterministic Debezium-envelope
fixture with c/u/d ops and at-least-once duplicate deliveries, replayed
through parse → unwrap → latest-state / batch-merge, compared against a
pure-Python "apply the log" oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_data_explorer_cdc_spark.cdc import (
    apply_cdc_batch,
    latest_state,
    parse_envelope,
    unwrap,
)
from kafka_data_explorer_cdc_spark.cdc.generator import (
    change_log_df,
    expected_final_state,
    generate_change_log,
)


@pytest.fixture(scope="module")
def log():
    return generate_change_log(n_keys=50, n_ops=300, seed=42)


@pytest.fixture(scope="module")
def flat(spark, log):
    raw = change_log_df(spark, log)
    df = unwrap(parse_envelope(raw))
    # key lives in the after-image for c/u, before-image for d
    return df.select(
        F.coalesce(F.col("after.orderid"), F.col("before.orderid")).alias("orderid"),
        F.col("after.custid").alias("custid"),
        F.col("after.amount").alias("amount"),
        F.col("after.city").alias("city"),
        "op",
        "lsn",
    ).cache()


def _as_state_dict(df):
    return {
        r["orderid"]: {
            "orderid": r["orderid"],
            "custid": r["custid"],
            "amount": r["amount"],
            "city": r["city"],
        }
        for r in df.select("orderid", "custid", "amount", "city").collect()
    }


def test_fixture_covers_all_ops(log):
    ops = {e["payload"]["op"] for e in log}
    assert ops == {"c", "u", "d"}
    lsns = [e["payload"]["source"]["lsn"] for e in log]
    assert len(lsns) != len(set(lsns)), "fixture must contain duplicate deliveries"


def test_latest_state_matches_python_oracle(flat, log):
    got = _as_state_dict(latest_state(flat, ["orderid"]))
    assert got == expected_final_state(log)


def test_batch_merge_equals_full_replay(spark, flat, log):
    """Splitting the log into micro-batches and MERGE-ing must equal the
    one-shot replay — the exactly-once-via-idempotence story.
    """
    n = flat.count()
    cuts = [0, n // 3, 2 * n // 3, n]
    state = None
    ordered = flat.orderBy("lsn").collect()
    for lo, hi in zip(cuts, cuts[1:]):
        batch = spark.createDataFrame(ordered[lo:hi], flat.schema)
        state = apply_cdc_batch(state, batch, ["orderid"])
    assert _as_state_dict(state) == expected_final_state(log)


def test_batch_merge_idempotent_on_replay(spark, flat, log):
    """Re-delivering an entire batch (at-least-once) must not change state."""
    state = apply_cdc_batch(None, flat, ["orderid"])
    replayed = apply_cdc_batch(state, flat, ["orderid"])
    assert _as_state_dict(replayed) == expected_final_state(log)


def test_delete_tombstones_removed(flat, log):
    deleted = {
        e["payload"]["before"]["orderid"]
        for e in log
        if e["payload"]["op"] == "d"
    } - set(expected_final_state(log))
    final_keys = {
        r["orderid"] for r in latest_state(flat, ["orderid"]).select("orderid").collect()
    }
    assert final_keys.isdisjoint(deleted)


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @given(
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        n_keys=st.integers(min_value=1, max_value=30),
        n_ops=st.integers(min_value=1, max_value=120),
        split=st.floats(min_value=0.1, max_value=0.9),
    )
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_property_incremental_merge_equals_python_replay(
        spark, seed, n_keys, n_ops, split
    ):
        """Property: for ANY generated change log, applying it in two
        arbitrary-size micro-batches through apply_cdc_batch equals the
        pure-Python sequential replay — key invariant of the CDC sink
        (order within batches, cross-batch boundaries, delete handling,
        duplicate delivery all drawn at random)."""
        log = generate_change_log(n_keys=n_keys, n_ops=n_ops, seed=seed)
        cut = max(1, int(len(log) * split))
        state = None
        for chunk in (log[:cut], log[cut:]):
            if not chunk:
                continue
            raw = change_log_df(spark, chunk)
            flat = unwrap(parse_envelope(raw))
            batch = flat.select(
                F.coalesce(
                    F.col("after.orderid"), F.col("before.orderid")
                ).alias("orderid"),
                F.col("after.custid").alias("custid"),
                F.col("after.amount").alias("amount"),
                F.col("after.city").alias("city"),
                "op",
                "lsn",
            )
            state = apply_cdc_batch(state, batch, ["orderid"])
        got = (
            {}
            if state is None
            else {
                r["orderid"]: (r["custid"], r["amount"], r["city"])
                for r in state.collect()
            }
        )
        want = {
            k: (v["custid"], v["amount"], v["city"])
            for k, v in expected_final_state(log).items()
        }
        assert got == want

    @given(
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        n_keys=st.integers(min_value=1, max_value=25),
        n_ops=st.integers(min_value=1, max_value=100),
        n_chunks=st.integers(min_value=2, max_value=5),
        perm_seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_property_shuffled_batches_converge(
        spark, seed, n_keys, n_ops, n_chunks, perm_seed
    ):
        """Property: applying the micro-batches in ANY order (stored
        form chained with keep_deletes=True, tombstones filtered only at
        read) converges to the same final state as the in-order Python
        replay. This is the invariant the round-2 tombstone-retention
        bug violated: without stored tombstones, a delete in an early
        batch is resurrected by a lower-lsn event delivered later.
        Micro-batch boundaries give no cross-batch ordering guarantee
        (file listing ties, Kafka partition interleave), so order-
        insensitivity is the correctness bar, not a nice-to-have."""
        import random

        log = generate_change_log(n_keys=n_keys, n_ops=n_ops, seed=seed)
        k = min(n_chunks, len(log))
        bounds = [round(i * len(log) / k) for i in range(k + 1)]
        chunks = [log[lo:hi] for lo, hi in zip(bounds, bounds[1:]) if hi > lo]
        random.Random(perm_seed).shuffle(chunks)
        state = None
        for chunk in chunks:
            raw = change_log_df(spark, chunk)
            flat = unwrap(parse_envelope(raw))
            batch = flat.select(
                F.coalesce(
                    F.col("after.orderid"), F.col("before.orderid")
                ).alias("orderid"),
                F.col("after.custid").alias("custid"),
                F.col("after.amount").alias("amount"),
                F.col("after.city").alias("city"),
                "op",
                "lsn",
            )
            state = apply_cdc_batch(state, batch, ["orderid"], keep_deletes=True)
        live = state.filter(F.col("op") != "d") if state is not None else None
        got = (
            {}
            if live is None
            else {
                r["orderid"]: (r["custid"], r["amount"], r["city"])
                for r in live.collect()
            }
        )
        want = {
            k2: (v["custid"], v["amount"], v["city"])
            for k2, v in expected_final_state(log).items()
        }
        assert got == want
