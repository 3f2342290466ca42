"""Multimodal plumbing tests: Arrow batch shapes, stub gating."""

from __future__ import annotations

import pytest

from kafka_data_explorer_cdc_spark.io import load
from kafka_data_explorer_cdc_spark.operators import multimodal as MM


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        MM.decode_image_real(b"\xff\xd8\xff")


def test_decode_images_schema_and_determinism(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = MM.decode_images(docs)
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "channels",
        "format",
    ]
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, MM.decode_images(docs.repartition(7)).collect()))
    assert a == b  # partitioning must not change decoded metadata


def test_binary_payload_roundtrip(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bin_df = MM.to_binary_docs(docs)
    row = bin_df.join(docs, "doc_id").select("payload", "text").first()
    assert bytes(row["payload"]).decode("utf-8") == row["text"]


def test_luma_histogram_gate_vectors(spark):
    """mm16 kernel contract: short payloads skipped; dominant-bin ties
    break to the LOWEST bin (oracle mirrors with ORDER BY n DESC, bin
    ASC); concentration score is the exact integer Σ n_b·bitlen(n_b) —
    maximal for a single-bin image, lower for a uniform histogram."""
    from kafka_data_explorer_cdc_spark.operators.multimodal import (
        image_luma_stats,
    )

    # fixtures stay ASCII: payload is the UTF-8 BYTES of the text, so
    # codepoints >= 128 would encode as two bytes and shift the grid
    flat = chr(40) * 256          # all pixels in bin 1 (40 >> 5)
    uniform = "".join(chr(b * 32) for b in range(4)) * 64  # 64 px in bins 0-3
    tie = (chr(0) * 128) + (chr(96) * 128)  # bins 0 and 3 tie at 128
    short = "x" * 100             # < 256 px: skipped
    df = spark.createDataFrame(
        [(1, flat), (2, uniform), (3, tie), (4, short)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in image_luma_stats(df).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1]["dom_bin"], got[1]["dom_n"]) == (1, 256)
    assert got[1]["conc"] == 256 * 9          # bitlen(256) = 9
    assert (got[2]["dom_bin"], got[2]["dom_n"]) == (0, 64)  # 4-way tie
    assert got[2]["conc"] == 4 * 64 * 7       # bitlen(64) = 7
    assert (got[3]["dom_bin"], got[3]["dom_n"]) == (0, 128)  # tie → low
    assert got[3]["conc"] == 2 * 128 * 8      # bitlen(128) = 8


def test_luma_gate_ascii_seam_both_engines(spark, tmp_path):
    """mm16 ADVICE regression (round 12): the kernel reads the first
    256 UTF-8 BYTES while the oracle reads CODEPOINTS — a non-ASCII
    doc used to silently diverge between engines. Both sides now
    filter any image whose 256-unit grid head contains non-ASCII, so
    the differential stays exact on a corpus the fixtures never had:
    one with multibyte text."""
    import duckdb
    import pandas as pd

    from kafka_data_explorer_cdc_spark.queries.registry import REGISTRY
    from tests.oracle_utils import canonicalize

    ascii_doc = "a" * 300
    # non-ASCII inside the 256-char head: bytes-vs-codepoints diverge
    head_nonascii = ("é" * 10) + ("b" * 290)
    # non-ASCII only AFTER the head: both engines must still KEEP it
    tail_nonascii = ("c" * 256) + ("é" * 50)
    short = "d" * 100
    rows = [
        (1, ascii_doc),
        (2, head_nonascii),
        (3, tail_nonascii),
        (4, short),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)

    got = (
        REGISTRY["mm16_image_histogram_gate"]
        .fn(spark, str(tmp_path))
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    want = con.execute(REGISTRY["mm16_image_histogram_gate"].oracle).df()
    assert sorted(got["doc_id"]) == [1, 3]  # head-non-ASCII + short gone
    assert canonicalize(got) == canonicalize(want)
