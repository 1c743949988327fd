"""Multimodal column plumbing (north star).

Convention: image/audio/video payloads are opaque ``binary`` columns plus a
typed metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signatures, partition sizing — is real and tested; the actual
media decode is STUBBED (image/audio libs are not in this container) behind
``decode_stub`` which raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it derives metadata purely from
the bytes (so tests and oracles are exact).

Scale notes (100 TB of media): binary payloads ride in parquet with the
metadata columns; filters on metadata prune row groups WITHOUT reading the
blobs (column pruning), and ``mapInPandas`` streams Arrow batches so one
task never holds more than ``maxRecordsPerBatch`` blobs in memory. Keep
``spark.sql.files.maxPartitionBytes`` sized so one task's blobs fit the
executor, and partition media tables by (modality, date).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("magic", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def decode_stub(payload: bytes, deterministic_fake: bool = False) -> tuple[int, int]:
    """Media decode stub. Real implementation would dispatch on magic bytes
    to an image/audio decoder; here we either fail loudly or derive fake
    dimensions deterministically from the payload."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in this environment"
        )
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1)


def extract_metadata(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [decode_stub(p, deterministic_fake) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) for p in payloads],
                    "magic": [bytes(p[:4]).hex() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(batches, schema=META_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque payload so the
    binary plumbing is exercised on real data."""
    return docs.select(
        col("doc_id"),
        F.lit("text").alias("modality"),
        F.encode(col("text"), "UTF-8").alias("payload"),
    )


def q60_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end binary plumbing: encode → mapInPandas metadata extract →
    aggregate. Oracle checks byte accounting exactly (text is ASCII here,
    and octet_length mirrors len(payload))."""
    docs = load(spark, sf_dir, "documents")
    meta = extract_metadata(documents_as_media(docs), deterministic_fake=True)
    return meta.groupBy("modality").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("width").alias("min_w"),
        F.max("height").alias("max_h"),
    )


ORACLES = {
    "q60_multimodal_meta": """
WITH m AS (SELECT doc_id, strlen(text) AS n_bytes FROM documents)
SELECT 'text' AS modality, COUNT(*) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(n_bytes % 640 + 1) AS BIGINT) AS min_w,
       CAST(MAX(n_bytes % 480 + 1) AS BIGINT) AS max_h
FROM m
""",
}

QUERIES = {"q60_multimodal_meta": q60_multimodal_meta}
