"""Deterministic CDC fixture generator.

Mirrors the reference's orders generator (``orders-generator/main.go:81-92``:
random custid [1,1000], amount [100,199], city over six values, one insert
per tick) but seed-fixed and extended with the ops the reference implies
yet never demonstrates: updates, deletes (``README.md:288``: op c|u|d) and
at-least-once redelivery (Connect semantics, ``docker-compose.yaml:35-37``).

The emitted log is a list of envelope dicts with strictly increasing
``lsn`` (except deliberate duplicate deliveries), so latest-state
materialization is well-defined (FIXTURES.md §1.2).
"""

from __future__ import annotations

import json
import random

from pyspark.sql import DataFrame, SparkSession

from .envelope import CITIES


def generate_change_log(
    n_keys: int = 50,
    n_ops: int = 300,
    seed: int = 42,
    dup_every: int = 17,
) -> list[dict]:
    """Return Debezium-shaped envelope dicts (op c/u/d, before/after
    images, monotone lsn, duplicate deliveries every ``dup_every`` ops).
    """
    rng = random.Random(seed)
    rows: dict[int, dict] = {}
    out: list[dict] = []
    lsn = 34220200
    ts = 1602057392691
    next_key = 1

    def envelope(op: str, before, after) -> dict:
        return {
            "payload": {
                "before": before,
                "after": after,
                "source": {
                    "version": "1.2.0.Final",
                    "connector": "postgresql",
                    "name": "myserver",
                    "ts_ms": ts,
                    "snapshot": "false",
                    "db": "postgres",
                    "schema": "inventory",
                    "table": "orders_info",
                    "txId": 653 + len(out),
                    "lsn": lsn,
                    "xmin": None,
                },
                "op": op,
                "ts_ms": ts + 1,
                "transaction": None,
            }
        }

    for i in range(n_ops):
        lsn += rng.randint(1, 9)
        ts += rng.randint(1, 3000)
        live = sorted(rows)
        # weights: mostly inserts early, then a mix — every key path hit
        choice = rng.random()
        if not live or choice < 0.5:
            key = next_key
            next_key += 1
            row = {
                "orderid": key,
                "custid": rng.randint(1, 1000),
                "amount": rng.randint(100, 199),
                "city": rng.choice(CITIES),
            }
            rows[key] = row
            out.append(envelope("c", None, row))
        elif choice < 0.85:
            key = rng.choice(live)
            before = rows[key]
            after = dict(before, amount=rng.randint(100, 199), city=rng.choice(CITIES))
            rows[key] = after
            out.append(envelope("u", before, after))
        else:
            key = rng.choice(live)
            before = rows.pop(key)
            out.append(envelope("d", before, None))
        if dup_every and i % dup_every == dup_every - 1:
            # at-least-once redelivery: replay the previous event verbatim
            out.append(json.loads(json.dumps(out[-1])))
    return out


def expected_final_state(log: list[dict]) -> dict[int, dict]:
    """Pure-Python oracle: apply the log in lsn order; highest lsn wins."""
    by_lsn: dict[int, dict] = {}
    for env in log:
        p = env["payload"]
        by_lsn[p["source"]["lsn"]] = p  # duplicate lsn collapses
    state: dict[int, dict] = {}
    for lsn in sorted(by_lsn):
        p = by_lsn[lsn]
        key = (p["after"] or p["before"])["orderid"]
        if p["op"] == "d":
            state.pop(key, None)
        else:
            state[key] = p["after"]
    return state


def change_log_df(spark: SparkSession, log: list[dict]) -> DataFrame:
    """Materialize the fixture as a raw Kafka-like DataFrame
    (key string, value JSON string) — the shape ``parse_envelope`` eats.
    """
    rows = [
        (
            str((e["payload"]["after"] or e["payload"]["before"])["orderid"]),
            json.dumps(e),
        )
        for e in log
    ]
    return spark.createDataFrame(rows, "key string, value string")
