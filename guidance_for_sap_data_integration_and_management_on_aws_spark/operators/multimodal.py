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


RESIZE_SCHEMA = "doc_id BIGINT, width INT, height INT, target INT, scale_pct INT"


def fake_resize_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize kernel: computes the letterboxed fit of the fake decoded
    dimensions into a 32x32 target (integer arithmetic only, so the oracle
    can replicate it).  Swap for Pillow's ``Image.resize`` in production —
    the Arrow-batched contract is the tested part."""
    for b in batches:
        n = b["payload"].str.len().astype("int64")
        w = (n % 64 + 1).astype("int64")
        h = (n % 48 + 1).astype("int64")
        # scale% preserving aspect: floor(100 * 32 / max(w, h)), capped at 100
        scale = (3200 // w.where(w >= h, h)).clip(upper=100)
        yield pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "width": ((w * scale) // 100).astype("int32"),
                "height": ((h * scale) // 100).astype("int32"),
                "target": 32,
                "scale_pct": scale.astype("int32"),
            }
        )


@spec(
    """
    WITH d AS (
      SELECT doc_id,
             octet_length(encode(text)) % 64 + 1 AS w,
             octet_length(encode(text)) % 48 + 1 AS h
      FROM documents
    ),
    s AS (
      SELECT doc_id, w, h,
             least(3200 // greatest(w, h), 100) AS scale
      FROM d
    )
    SELECT doc_id,
           CAST((w * scale) // 100 AS INTEGER) AS width,
           CAST((h * scale) // 100 AS INTEGER) AS height,
           32 AS target,
           CAST(scale AS INTEGER) AS scale_pct
    FROM s
    """,
    doc="L5 resize via Arrow-batched mapInPandas: aspect-preserving integer "
    "letterbox fit into 32x32 (kernel stubbed deterministically; a real "
    "build calls Pillow in the same batch loop).",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = build_media_frame(spark, sf_dir)
    return media.mapInPandas(fake_resize_meta, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_offset_bytes BIGINT, frame_sha256 STRING"
FRAME_STRIDE = 100  # one sampled "frame" per 100 payload bytes


def fake_frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampler (one row in -> many out, the UDTF shape of video
    frame extraction): every ``FRAME_STRIDE`` bytes of payload becomes one
    'frame' whose identity is the sha256 of that byte slice.  Swap for
    pyav/ffmpeg keyframe extraction in production."""
    import hashlib

    for b in batches:
        out: dict[str, list] = {k: [] for k in ("doc_id", "frame_idx", "frame_offset_bytes", "frame_sha256")}
        for doc_id, payload in zip(b["doc_id"], b["payload"]):
            for idx in range(0, len(payload) // FRAME_STRIDE + 1):
                off = idx * FRAME_STRIDE
                sl = payload[off : off + FRAME_STRIDE]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_offset_bytes"].append(off)
                out["frame_sha256"].append(hashlib.sha256(sl).hexdigest())
        yield pd.DataFrame(out)


@spec(
    f"""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents
    ),
    idx AS (
      SELECT d.doc_id, d.text, CAST(g.range AS INTEGER) AS frame_idx
      FROM d, range(0, 100000) g
      WHERE g.range <= d.n // {FRAME_STRIDE}
    )
    -- text is ASCII in the fixture (octet_length == length, asserted in
    -- tests), so character slicing == byte slicing
    SELECT doc_id, frame_idx,
           CAST(frame_idx * {FRAME_STRIDE} AS BIGINT) AS frame_offset_bytes,
           sha256(substring(text, frame_idx * {FRAME_STRIDE} + 1, {FRAME_STRIDE}))
             AS frame_sha256
    FROM idx
    """,
    doc="L5 frame sampling via mapInPandas (1 row -> many): every "
    f"{FRAME_STRIDE}-byte slice of the payload is one 'frame' identified by "
    "its sha256 — the UDTF-shaped plumbing of video keyframe extraction, "
    "with a deterministic stub kernel the oracle replicates via blob slicing.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = build_media_frame(spark, sf_dir)
    return media.mapInPandas(fake_frame_sample, FRAME_SCHEMA)


QUERIES: dict[str, QuerySpec] = {
    "mm_payload_hash": mm_payload_hash,
    "mm_decode": mm_decode,
    "mm_asset_stats": mm_asset_stats,
    "mm_resize": mm_resize,
    "mm_frame_sample": mm_frame_sample,
}
