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
