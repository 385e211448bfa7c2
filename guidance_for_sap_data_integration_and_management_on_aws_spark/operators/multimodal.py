"""Multimodal column handling (SURVEY §2.9 L5): opaque binary payloads with
typed metadata, content-hash identity, and a Pandas-UDF decode pipeline.

The container has no image/audio codecs, so the *decode kernel* is a
clearly-marked deterministic stub (``fake_decode_meta``) — but the Spark-side
plumbing is real and is what matters at scale: ``BinaryType`` payload
columns, metadata structs, Arrow-batched ``mapInPandas`` with a bounded batch
size (``spark.sql.execution.arrow.maxRecordsPerBatch`` governs memory per
executor — binary payloads can be MBs each, so real deployments lower it).
A production build swaps ``fake_decode_meta`` for Pillow/ffmpeg calls with
no change to the dataflow.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import QuerySpec, spec


@spec(
    """
    SELECT doc_id,
           sha256(text) AS payload_sha256,
           octet_length(encode(text)) AS payload_bytes,
           source AS media_source
    FROM documents
    """,
    doc="L5 content-hash identity over a binary payload column (sha2-256) — "
    "the dedup key for multimodal blobs.",
)
def mm_payload_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")  # stand-in blob: utf-8 bytes of text
    return d.select(
        "doc_id",
        F.sha2(payload, 256).alias("payload_sha256"),
        F.octet_length(payload).alias("payload_bytes"),
        F.col("source").alias("media_source"),
    )


def build_media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal table shape: binary payload + typed metadata struct."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.lit("image/fake").alias("mime"),
            F.col("n_chars").cast("long").alias("content_length"),
        ).alias("meta"),
    )


DECODE_SCHEMA = "doc_id BIGINT, width INT, height INT, n_pixels BIGINT, decoder STRING"


def fake_decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode kernel (no codecs in-container): derives deterministic
    fake dimensions from payload length.  Replace with a real decoder
    (Pillow / torchaudio / pyav) in production; the mapInPandas contract —
    Arrow batches in, Arrow batches out, one row per input row — is the
    real, tested part."""
    for b in batches:
        n = b["payload"].str.len().astype("int64")
        width = (n % 64 + 1).astype("int32")
        height = (n % 48 + 1).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "width": width,
                "height": height,
                "n_pixels": (width.astype("int64") * height).astype("int64"),
                "decoder": "stub-v1",
            }
        )


@spec(
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 48 + 1 AS INTEGER) AS height,
           CAST((octet_length(encode(text)) % 64 + 1)
                * (octet_length(encode(text)) % 48 + 1) AS BIGINT) AS n_pixels,
           'stub-v1' AS decoder
    FROM documents
    """,
    doc="L5 decode/feature-extract via Arrow-batched mapInPandas over binary "
    "payloads (decode kernel stubbed deterministically; plumbing real, so the "
    "oracle can replicate the stub's arithmetic).",
)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = build_media_frame(spark, sf_dir)
    return media.mapInPandas(fake_decode_meta, DECODE_SCHEMA)


@spec(
    """
    SELECT source AS origin, COUNT(*) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(octet_length(encode(text))) AS max_bytes
    FROM documents GROUP BY source
    """,
    doc="L5 asset inventory by origin over the metadata struct (typed access "
    "into nested metadata, aggregated without touching payload bytes — column "
    "pruning keeps the blobs unread).",
)
def mm_asset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = build_media_frame(spark, sf_dir)
    return media.groupBy(F.col("meta.origin").alias("origin")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.col("meta.content_length")).alias("total_bytes"),
        F.max(F.col("meta.content_length")).alias("max_bytes"),
    )


QUERIES: dict[str, QuerySpec] = {
    "mm_payload_hash": mm_payload_hash,
    "mm_decode": mm_decode,
    "mm_asset_stats": mm_asset_stats,
}
