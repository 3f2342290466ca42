"""Portable Bloom-filter semi-join reduction — the 100 TB shuffle saver.

A semi join of a 100 TB fact table against a small key set normally
shuffles (or at best scans-and-broadcast-probes) the full fact side.
The classic fix is a Bloom filter: build an m-bit filter over the small
side's keys (kilobytes, regardless of big-side size), broadcast it, and
drop non-matching fact rows AT THE SCAN, before any shuffle. Spark's
own runtime bloom-join (``spark.sql.optimizer.runtime.bloomFilter.*``)
does exactly this inside AQE, but its ``bloom_filter_agg`` /
``might_contain`` expressions are not registered for user SQL — so this
module builds the same structure from public primitives, keeping every
per-row operation JVM-side (whole-stage codegen; zero Python in the
hot path):

- **probes**: double hashing (Kirsch–Mitzenmacher): ``g_i(x) =
  (h1(x) + i·h2(x)) mod m`` from two ``xxhash64`` evaluations — k
  independent-enough probes for the standard false-positive bound.
  Both hashes are reduced mod m BEFORE combining so the arithmetic
  never overflows under ANSI mode.
- **build**: explode each small-side key into its k bit positions,
  ``bit_or`` them into 64-bit words, and assemble ONE dense
  ``array<bigint>`` row on the driver (bounded by m/64 words — a
  config constant ≈ kilobytes, never data-sized).
- **probe**: broadcast-cross-join the 1-row bitmap to the big side
  (1×N broadcast nested loop is free) and test
  ``(element_at(bitmap, idx/64+1) >> (idx%64)) & 1`` for all k probes
  — pure codegen comparisons.

No false negatives ⇒ chaining an exact semi join after the Bloom
prefilter returns EXACTLY the plain semi join's rows, so the operator
is oracle-checkable bit-for-bit while the filter does the scale work
(at 1% fpp the follow-up join sees ~1% of non-matching rows instead
of 100%).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_H2_SALT = 0x9E3779B9  # golden-ratio constant, decorrelates h2 from h1


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``n_items`` at target false-positive
    rate: m = -n·ln(p)/ln²2 rounded up to a multiple of 64, k =
    (m/n)·ln2."""
    n = max(1, n_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round((m / n) * math.log(2)))
    return m, k


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k probe positions via double hashing, overflow-safe mod-first."""
    h1 = F.pmod(F.xxhash64(key), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(_H2_SALT)), F.lit(m_bits))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def build_bloom(small: DataFrame, key_col: str, m_bits: int, k: int) -> DataFrame:
    """Build the filter as a ONE-ROW DataFrame holding the dense bitmap
    (``array<bigint>`` of m/64 words). The word collect is bounded by
    m/64 (config constant, e.g. 2^20 bits → 16 384 words ≈ 128 KB) —
    the same bounded-driver-state class as the IVF codebook."""
    spark = small.sparkSession
    n_words = m_bits // 64
    pos = small.select(
        F.explode(F.array(*_bit_positions(F.col(key_col), m_bits, k))).alias("p")
    )
    words = (
        pos.groupBy((F.col("p") / 64).cast("long").alias("w"))
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))").alias(
                "bits"
            )
        )
        .collect()
    )
    dense = [0] * n_words
    for r in words:
        dense[int(r["w"])] = int(r["bits"])
    return spark.createDataFrame([(dense,)], "__bloom array<bigint>")


def might_contain(key: Column, bitmap_col: Column, m_bits: int, k: int) -> Column:
    """All-k-bits-set test, pure codegen (no Python, no UDF)."""
    cond = F.lit(True)
    for p in _bit_positions(key, m_bits, k):
        word = F.element_at(bitmap_col, ((p / 64).cast("long") + 1).cast("int"))
        # F.shiftright's wrapper only takes a literal shift; the SQL
        # function itself accepts a column
        bit = F.call_function(
            "shiftright", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1))
        cond = cond & (bit == 1)
    return cond


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    fpp: float = 0.01,
    n_items: int | None = None,
) -> DataFrame:
    """Semi join ``big ⋉ small`` with a Bloom prefilter on the big side.

    Exactly equivalent to ``big.join(small, on, 'left_semi')`` (no
    false negatives; the follow-up exact semi join removes the ~fpp
    false positives) — but at scale the big side shrinks BEFORE the
    join's shuffle/broadcast, which is the entire cost of the naive
    plan. ``n_items`` sizes the filter (one bounded count job on the
    small side when omitted — same pattern as the IVF codebook)."""
    if n_items is None:
        n_items = small.count()
    m_bits, k = bloom_params(n_items, fpp)
    bitmap = build_bloom(small, small_key, m_bits, k)
    prefiltered = big.crossJoin(broadcast(bitmap)).filter(
        might_contain(F.col(big_key), F.col("__bloom"), m_bits, k)
    ).drop("__bloom")
    # alias both sides so big_key == small_key stays unambiguous
    keys = small.select(F.col(small_key).alias("__bf_key")).distinct()
    return prefiltered.alias("__bf_big").join(
        broadcast(keys),
        F.col(f"__bf_big.{big_key}") == F.col("__bf_key"),
        "left_semi",
    )
