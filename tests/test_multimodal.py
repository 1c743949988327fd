"""Multimodal plumbing: resize stub (schema, batch shape, byte accounting)
and the decode stub's fail-loud path."""

from __future__ import annotations

import pytest

from eventstream_spark.catalog import load
from eventstream_spark.operators.multimodal import (
    decode_stub,
    documents_as_media,
    resize_media,
)


def test_resize_media_shapes_and_bytes(spark, sf_dir):
    media = documents_as_media(load(spark, sf_dir, "documents").limit(20))
    out = resize_media(media, width=32, height=16)
    rows = out.collect()
    assert len(rows) == 20
    assert set(out.columns) == {"doc_id", "modality", "payload", "width", "height"}
    for r in rows:
        assert len(r.payload) == 32 * 16
        assert (r.width, r.height) == (32, 16)
    # Deterministic: same input → identical bytes on rerun.
    again = {r.doc_id: bytes(r.payload) for r in resize_media(media, 32, 16).collect()}
    assert all(bytes(r.payload) == again[r.doc_id] for r in rows)


def test_stubs_fail_loud_without_fake(spark, sf_dir):
    media = documents_as_media(load(spark, sf_dir, "documents").limit(1))
    with pytest.raises(NotImplementedError, match="image"):
        resize_media(media, 8, 8, deterministic_fake=False)
    with pytest.raises(NotImplementedError, match="decoding"):
        decode_stub(b"xx", deterministic_fake=False)
