"""Multimodal plumbing: the Pandas-UDF decode stage has no SQL oracle,
so its values are asserted here instead."""

from __future__ import annotations

from resotodatalink_spark.operators.multimodal import attach_payload, decode_media
from resotodatalink_spark.sources.tables import table
from tests.conftest import SF_DIR


def test_decode_schema_and_values(spark):
    d = table(spark, SF_DIR, "documents")
    out = decode_media(attach_payload(d))
    assert out.columns == [
        "doc_id",
        "n_bytes",
        "header_byte",
        "fake_width",
        "fake_height",
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    docs = {r["doc_id"]: r["text"] for r in d.collect()}
    assert len(rows) == len(docs)
    for doc_id, text in list(docs.items())[:20]:
        r = rows[doc_id]
        payload = text.encode("utf-8")
        assert r["n_bytes"] == len(payload)
        assert r["header_byte"] == payload[0]
        assert r["fake_width"] == 1 + payload[0] % 64
        assert r["fake_height"] == 1 + len(payload) % 64


def test_payload_metadata_struct(spark):
    d = table(spark, SF_DIR, "documents")
    p = attach_payload(d)
    row = p.select("media_meta.mime", "media_meta.content_length").first()
    assert row[0] == "image/fake" and row[1] > 0
