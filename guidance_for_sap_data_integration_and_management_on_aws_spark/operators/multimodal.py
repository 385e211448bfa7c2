"""Multimodal column handling (SURVEY §2.9 L5): opaque binary payloads with
typed metadata, content-hash identity, and a Pandas-UDF decode pipeline.

Two tiers of decode kernel:

* **REAL stdlib codecs** — uncompressed 24-bit BMP (struct/numpy header +
  pixel-array parsing, stride padding, bottom-up row order) and mono 16-bit
  PCM WAV (stdlib ``wave``): `mm_bmp_decode`, `mm_bmp_resize`,
  `mm_wav_decode` generate genuine files and parse the actual bytes back,
  oracle-checked against the generators' closed-form arithmetic.
* **Declared stubs** — `mm_decode`/`mm_resize`/`mm_frame_sample` keep the
  deterministic length-derived kernels for formats whose codecs aren't in
  this container (JPEG/video need Pillow/pyav/ffmpeg); the docstrings say
  exactly what swaps in.

Either way the Spark-side plumbing is what matters at scale: ``BinaryType``
payload columns, metadata structs, Arrow-batched ``mapInPandas`` with a
bounded batch size (``spark.sql.execution.arrow.maxRecordsPerBatch`` governs
memory per executor — binary payloads can be MBs each, so real deployments
lower it).
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


# ---------------------------------------------------------------------------
# REAL codecs (stdlib-only): uncompressed 24-bit BMP, PCM WAV, and DIB-in-AVI
# video.
#
# The container has no Pillow/ffmpeg, but BMP, WAV and the RIFF/AVI container
# are fully specified header+payload formats parseable with struct/wave/numpy
# — so these paths decode REAL bytes end-to-end: a deterministic generator
# writes genuine files, the Arrow-batched kernels parse the actual headers
# and pixel/sample arrays (bottom-up DIB rows, 4-byte stride padding,
# little-endian PCM, RIFF chunk walking), and the DuckDB oracle recomputes
# the expected values from the generator's closed-form arithmetic.
# mm_video_frames samples frames from genuine AVI files; mm_frame_sample
# remains the codec-free byte-window fallback for opaque formats.
# ---------------------------------------------------------------------------

import io
import struct
import wave

import numpy as np


def _gen_bmp(i: int) -> bytes:
    """A real uncompressed 24-bit BMP: pixel byte j (row-major top-down,
    BGR interleaved) has value (i*31 + j) % 256; stored bottom-up with
    4-byte row stride padding, exactly per the BITMAPINFOHEADER spec."""
    w, h, a = 4 + i % 13, 3 + i % 7, (i * 31) % 256
    row_len = w * 3
    pad = (-row_len) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = bytes((a + (y * w + x) * 3 + c) % 256 for x in range(w) for c in range(3))
        rows.append(row + b"\x00" * pad)
    px = b"".join(rows)
    off = 14 + 40
    fh = struct.pack("<2sIHHI", b"BM", off + len(px), 0, 0, off)
    ih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return fh + ih + px


def parse_bmp(payload: bytes) -> tuple[int, int, int, "np.ndarray"]:
    """Parse a real BMP: validates the magic, reads the declared pixel-array
    offset and dimensions from the headers, un-pads and un-flips the
    bottom-up rows.  Returns (width, height, bpp, h x w x 3 uint8 array)."""
    magic, _, _, _, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP payload (magic {magic!r})")
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    stride = w * 3 + ((-w * 3) % 4)
    arr = np.frombuffer(payload, dtype=np.uint8, offset=off, count=h * stride)
    img = arr.reshape(h, stride)[:, : w * 3][::-1].reshape(h, w, 3)
    return w, h, bpp, img


def _gen_wav(i: int) -> bytes:
    """A real mono 16-bit PCM WAV (stdlib ``wave`` writer): sample t is
    ((i*7 + t*13) % 65536) - 32768, little-endian signed."""
    rate, n, a = 8000 + (i % 3) * 4000, 50 + i % 50, (i * 7) % 65536
    frames = b"".join(
        struct.pack("<h", ((a + t * 13) % 65536) - 32768) for t in range(n)
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(frames)
    return buf.getvalue()


def build_bmp_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def gen(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(lambda i: _gen_bmp(int(i)))

    return load(spark, sf_dir, "documents").select("doc_id", gen("doc_id").alias("payload"))


def build_wav_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def gen(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(lambda i: _gen_wav(int(i)))

    return load(spark, sf_dir, "documents").select("doc_id", gen("doc_id").alias("payload"))


_SQL_BMP_DIMS = """
    SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h,
           (doc_id * 31) % 256 AS a
    FROM documents
"""


@spec(
    f"""
    WITH d AS ({_SQL_BMP_DIMS}),
    s AS (
      SELECT d.doc_id, d.w, d.h,
             SUM((d.a + g.range) % 256) AS px_sum, COUNT(*) AS n
      FROM d, range(0, 432) g WHERE g.range < d.w * d.h * 3
      GROUP BY 1, 2, 3
    )
    SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           24 AS bpp, CAST(px_sum AS DOUBLE) / n AS mean_px,
           'bmp-stdlib' AS decoder
    FROM s
    """,
    doc="L5 REAL image decode: deterministic genuine 24-bit BMPs generated "
    "per doc, parsed back by an Arrow-batched kernel that validates the "
    "magic, reads header-declared offsets/dimensions, strips stride padding "
    "and un-flips the bottom-up rows; mean pixel value from the actual "
    "decoded array.  Oracle recomputes from the generator's closed form — "
    "header parsing, padding, or row-order bugs all surface as value "
    "mismatches.",
)
def mm_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "bpp", "mean_px")}
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                w, h, bpp, img = parse_bmp(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["bpp"].append(bpp)
                rows["mean_px"].append(int(img.astype(np.int64).sum()) / (w * h * 3))
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            out["bpp"] = out["bpp"].astype("int32")
            out["decoder"] = "bmp-stdlib"
            yield out

    return build_bmp_frame(spark, sf_dir).mapInPandas(
        kernel, "doc_id BIGINT, width INT, height INT, bpp INT, mean_px DOUBLE, decoder STRING"
    )


@spec(
    f"""
    WITH d AS ({_SQL_BMP_DIMS}),
    grid AS (
      SELECT gx.range AS xp, gy.range AS yp, gc.range AS c
      FROM range(0, 8) gx, range(0, 8) gy, range(0, 3) gc
    ),
    s AS (
      SELECT d.doc_id,
             SUM((d.a + (((yp * d.h) // 8) * d.w + ((xp * d.w) // 8)) * 3 + c) % 256)
               AS rs,
             COUNT(*) AS n
      FROM d, grid GROUP BY 1
    )
    SELECT doc_id, 8 AS out_w, 8 AS out_h,
           CAST(rs AS DOUBLE) / n AS mean_resized, 'bmp-stdlib' AS decoder
    FROM s
    """,
    doc="L5 REAL image resize: nearest-neighbor 8x8 downsample of the "
    "actually-decoded BMP pixel matrix (numpy index sampling, the same "
    "sampling grid Pillow's NEAREST uses); oracle recomputes the sampled "
    "coordinates' closed-form values.",
)
def mm_bmp_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in ("doc_id", "out_w", "out_h", "mean_resized")}
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                w, h, _, img = parse_bmp(bytes(payload))
                sy = (np.arange(8) * h) // 8
                sx = (np.arange(8) * w) // 8
                small = img[np.ix_(sy, sx)]
                rows["doc_id"].append(doc_id)
                rows["out_w"].append(8)
                rows["out_h"].append(8)
                rows["mean_resized"].append(int(small.astype(np.int64).sum()) / small.size)
            out = pd.DataFrame(rows)
            out["out_w"] = out["out_w"].astype("int32")
            out["out_h"] = out["out_h"].astype("int32")
            out["decoder"] = "bmp-stdlib"
            yield out

    return build_bmp_frame(spark, sf_dir).mapInPandas(
        kernel, "doc_id BIGINT, out_w INT, out_h INT, mean_resized DOUBLE, decoder STRING"
    )


@spec(
    """
    WITH d AS (
      SELECT doc_id, 8000 + (doc_id % 3) * 4000 AS rate, 50 + doc_id % 50 AS n,
             (doc_id * 7) % 65536 AS a
      FROM documents
    ),
    s AS (
      SELECT d.doc_id, SUM(abs(((d.a + g.range * 13) % 65536) - 32768)) AS sabs
      FROM d, range(0, 99) g WHERE g.range < d.n GROUP BY 1
    )
    SELECT d.doc_id, 1 AS n_channels, 2 AS sample_width,
           CAST(d.rate AS INTEGER) AS sample_rate, CAST(d.n AS INTEGER) AS n_frames,
           CAST(s.sabs AS DOUBLE) / d.n AS mean_abs, 'wav-stdlib' AS decoder
    FROM d JOIN s USING (doc_id)
    """,
    doc="L5 REAL audio decode: genuine mono 16-bit PCM WAVs generated per "
    "doc (stdlib wave writer), parsed back with the stdlib wave reader — "
    "channel/width/rate/frame metadata from the actual RIFF headers, mean "
    "absolute amplitude from the actual little-endian sample bytes; oracle "
    "recomputes the generator's closed form.",
)
def mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {
                k: []
                for k in (
                    "doc_id",
                    "n_channels",
                    "sample_width",
                    "sample_rate",
                    "n_frames",
                    "mean_abs",
                )
            }
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as wv:
                    nch, width, rate, n = (
                        wv.getnchannels(),
                        wv.getsampwidth(),
                        wv.getframerate(),
                        wv.getnframes(),
                    )
                    samples = np.frombuffer(wv.readframes(n), dtype="<i2")
                rows["doc_id"].append(doc_id)
                rows["n_channels"].append(nch)
                rows["sample_width"].append(width)
                rows["sample_rate"].append(rate)
                rows["n_frames"].append(n)
                rows["mean_abs"].append(int(np.abs(samples.astype(np.int64)).sum()) / n)
            out = pd.DataFrame(rows)
            for c in ("n_channels", "sample_width", "sample_rate", "n_frames"):
                out[c] = out[c].astype("int32")
            out["decoder"] = "wav-stdlib"
            yield out

    return build_wav_frame(spark, sf_dir).mapInPandas(
        kernel,
        "doc_id BIGINT, n_channels INT, sample_width INT, sample_rate INT, "
        "n_frames INT, mean_abs DOUBLE, decoder STRING",
    )


# ---------------------------------------------------------------------------
# REAL video: uncompressed BGR24 ('DIB ') frames in a genuine RIFF/AVI
# container — RIFF(hdrl(avih, strl(strh, strf)), movi('00db'...)) written
# with struct and parsed back by walking the actual chunk tree.
# ---------------------------------------------------------------------------

FRAME_SAMPLE_EVERY = 2  # keyframe-ish sampling: every 2nd frame


def _avi_frame_bytes(w: int, h: int, a: int, f: int) -> bytes:
    """Frame ``f`` pixel bytes, DIB layout: value at (y, x, channel) is
    (a + f*17 + (y*w + x)*3 + c) % 256, stored bottom-up with 4-byte row
    stride padding (same convention as the BMP generator)."""
    pad = (-w * 3) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = bytes(
            (a + f * 17 + (y * w + x) * 3 + c) % 256 for x in range(w) for c in range(3)
        )
        rows.append(row + b"\x00" * pad)
    return b"".join(rows)


def _gen_avi(i: int) -> bytes:
    """A real AVI file: RIFF container, 'vids'/'DIB ' stream of n_frames
    uncompressed bottom-up BGR24 frames at 10 fps."""
    w, h, nf, a = 4 + i % 5, 3 + i % 4, 3 + i % 6, (i * 11) % 256
    stride = w * 3 + ((-w * 3) % 4)
    frame_size = stride * h
    avih = struct.pack(
        "<10I4I", 100_000, 0, 0, 0, nf, 0, 1, frame_size, w, h, 0, 0, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, 10, 0, nf, frame_size, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl"
    strl += b"strh" + struct.pack("<I", len(strh)) + strh
    strl += b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl_body = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi"
    for f in range(nf):
        fr = _avi_frame_bytes(w, h, a, f)
        movi_body += b"00db" + struct.pack("<I", len(fr)) + fr  # stride keeps it even
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_riff(payload: bytes, pos: int, end: int, out: dict[bytes, list[bytes]]) -> None:
    # clamp to the actual buffer: a truncated file may declare chunk sizes
    # past EOF, which must surface as a parse error, not a struct crash
    end = min(end, len(payload))
    while pos + 8 <= end:
        fourcc, size = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if fourcc in (b"LIST", b"RIFF"):
            _walk_riff(payload, body + 4, body + size, out)  # skip the list type
        else:
            out.setdefault(fourcc, []).append(payload[body : body + size])
        pos = body + size + (size & 1)  # RIFF chunks are word-aligned


def parse_avi(payload: bytes) -> tuple[int, int, int, list["np.ndarray"]]:
    """Parse a real AVI: validates RIFF/'AVI ' magic, reads dimensions and
    frame count from the actual avih header, cross-checks against strf
    (BITMAPINFOHEADER), then un-pads and un-flips every '00db' DIB frame.
    Returns (width, height, us_per_frame, [h x w x 3 uint8 arrays])."""
    magic, _, ftype = struct.unpack_from("<4sI4s", payload, 0)
    if magic != b"RIFF" or ftype != b"AVI ":
        raise ValueError(f"not an AVI payload (magic {magic!r}/{ftype!r})")
    chunks: dict[bytes, list[bytes]] = {}
    _walk_riff(payload, 0, len(payload), chunks)
    avih = struct.unpack_from("<10I", chunks[b"avih"][0])
    us_per_frame, n_frames, w, h = avih[0], avih[4], avih[8], avih[9]
    _, sw, sh, _, bpp = struct.unpack_from("<IiiHH", chunks[b"strf"][0])
    if (sw, sh) != (w, h) or bpp != 24:
        raise ValueError(f"stream format mismatch: {(sw, sh, bpp)} vs avih {(w, h)}")
    raw = chunks.get(b"00db", [])
    if len(raw) != n_frames:
        raise ValueError(f"frame count mismatch: {len(raw)} chunks vs avih {n_frames}")
    stride = w * 3 + ((-w * 3) % 4)
    frames = [
        np.frombuffer(fr, dtype=np.uint8, count=h * stride)
        .reshape(h, stride)[:, : w * 3][::-1]
        .reshape(h, w, 3)
        for fr in raw
    ]
    return w, h, us_per_frame, frames


def build_avi_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def gen(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(lambda i: _gen_avi(int(i)))

    return load(spark, sf_dir, "documents").select("doc_id", gen("doc_id").alias("payload"))


@spec(
    f"""
    WITH d AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
             3 + doc_id % 6 AS nf, (doc_id * 11) % 256 AS a
      FROM documents
    ),
    fr AS (
      SELECT d.*, CAST(g.range AS INTEGER) AS frame_idx
      FROM d, range(0, 8) g
      WHERE g.range < d.nf AND g.range % {FRAME_SAMPLE_EVERY} = 0
    ),
    s AS (
      SELECT doc_id, frame_idx, w, h,
             SUM((a + frame_idx * 17 + j.range) % 256) AS px_sum, COUNT(*) AS n
      FROM fr, range(0, 144) j WHERE j.range < w * h * 3
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id, frame_idx, CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(px_sum AS DOUBLE) / n AS mean_px, 'avi-stdlib' AS decoder
    FROM s
    """,
    doc="L5 REAL video frame sampling: genuine AVI files (RIFF container, "
    "'vids'/'DIB ' stream, '00db' uncompressed BGR24 frames) generated per "
    "doc and parsed back by walking the actual chunk tree — avih/strf "
    "headers cross-validated, stride padding stripped, bottom-up rows "
    f"un-flipped; every {FRAME_SAMPLE_EVERY}nd frame sampled with its mean "
    "pixel value from the decoded array (1 row in -> many out, the video "
    "UDTF shape).  Oracle recomputes the generator's closed form — any "
    "container-walking, header, padding or row-order bug surfaces as a "
    "value mismatch.  Retires the former stub status of video decode; swap "
    "the kernel body for pyav/ffmpeg keyframe extraction in production.",
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "width", "height", "mean_px")}
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                w, h, _, frames = parse_avi(bytes(payload))
                for idx in range(0, len(frames), FRAME_SAMPLE_EVERY):
                    img = frames[idx]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["mean_px"].append(int(img.astype(np.int64).sum()) / img.size)
            out = pd.DataFrame(rows)
            for c in ("frame_idx", "width", "height"):
                out[c] = out[c].astype("int32")
            out["decoder"] = "avi-stdlib"
            yield out

    return build_avi_frame(spark, sf_dir).mapInPandas(
        kernel,
        "doc_id BIGINT, frame_idx INT, width INT, height INT, mean_px DOUBLE, decoder STRING",
    )


@spec(
    """
    WITH d AS (
      SELECT doc_id, 8000 + (doc_id % 3) * 4000 AS rate, 50 + doc_id % 50 AS n,
             (doc_id * 7) % 65536 AS a
      FROM documents
    ),
    s AS (
      SELECT d.doc_id, CAST(g.range AS BIGINT) AS t,
             ((d.a + g.range * 13) % 65536) - 32768 AS v
      FROM d, range(0, 99) g WHERE g.range < d.n
    ),
    l AS (
      SELECT doc_id, t, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv
      FROM s
    )
    SELECT d.doc_id,
           sqrt(CAST(SUM(CAST(l.v AS BIGINT) * l.v) AS DOUBLE) / d.n) AS rms,
           CAST(COUNT(*) FILTER (WHERE l.pv IS NOT NULL
                                 AND ((l.v >= 0) <> (l.pv >= 0))) AS BIGINT)
             AS zero_crossings,
           CAST(MAX(abs(l.v)) AS BIGINT) AS peak_abs
    FROM l JOIN d USING (doc_id) GROUP BY d.doc_id, d.n
    """,
    doc="L5 audio FEATURE EXTRACTION over real WAV bytes: RMS amplitude, "
    "zero-crossing count and peak from the actually-decoded little-endian "
    "PCM samples (numpy kernel over the stdlib wave reader) — the standard "
    "audio-curation features (silence/clipping/voicedness gates) for "
    "training pipelines.  int64 square-sums are exact, the final sqrt is "
    "one correctly-rounded IEEE op, so the oracle (a lag window over the "
    "generator's closed-form samples) matches bit-for-bit.",
)
def mm_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for b in batches:
            rows = {k: [] for k in ("doc_id", "rms", "zero_crossings", "peak_abs")}
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as wv:
                    n = wv.getnframes()
                    samples = np.frombuffer(wv.readframes(n), dtype="<i2").astype(np.int64)
                sq = int((samples * samples).sum())
                nonneg = samples >= 0
                zc = int((nonneg[1:] != nonneg[:-1]).sum())
                rows["doc_id"].append(doc_id)
                rows["rms"].append(math.sqrt(sq / n))
                rows["zero_crossings"].append(zc)
                rows["peak_abs"].append(int(np.abs(samples).max()))
            out = pd.DataFrame(rows)
            out["zero_crossings"] = out["zero_crossings"].astype("int64")
            out["peak_abs"] = out["peak_abs"].astype("int64")
            yield out

    return build_wav_frame(spark, sf_dir).mapInPandas(
        kernel, "doc_id BIGINT, rms DOUBLE, zero_crossings BIGINT, peak_abs BIGINT"
    )


# aHash recomputation from the BMP generator's closed form, shared by the
# mm_bmp_ahash oracle and the hamming near-dup oracle below.
_SQL_AHASH_CTES = f"""
    d AS ({_SQL_BMP_DIMS}),
    grid AS (
      SELECT gy.range AS yp, gx.range AS xp FROM range(0, 8) gy, range(0, 8) gx
    ),
    px AS (
      -- sampled luma = GREEN channel value (c=1) at the nearest-neighbor grid
      SELECT d.doc_id, yp, xp,
             (d.a + (((yp * d.h) // 8) * d.w + ((xp * d.w) // 8)) * 3 + 1) % 256 AS v
      FROM d, grid
    ),
    m AS (SELECT doc_id, CAST(SUM(v) AS DOUBLE) / 64 AS mean_v FROM px GROUP BY doc_id),
    ah AS (
      SELECT px.doc_id,
             CAST(SUM(CASE WHEN px.yp < 4 AND px.v > m.mean_v
                           THEN power(2, px.yp * 8 + px.xp) ELSE 0 END) AS BIGINT) AS ahash_hi,
             CAST(SUM(CASE WHEN px.yp >= 4 AND px.v > m.mean_v
                           THEN power(2, (px.yp - 4) * 8 + px.xp) ELSE 0 END) AS BIGINT) AS ahash_lo
      FROM px JOIN m USING (doc_id) GROUP BY px.doc_id
    )
"""


@spec(
    f"""
    WITH {_SQL_AHASH_CTES}
    SELECT doc_id, ahash_hi, ahash_lo FROM ah
    """,
    doc="L5 image AVERAGE-HASH (aHash) over real BMP bytes: decode, 8x8 "
    "nearest-neighbor downsample of the green channel, threshold each cell "
    "against the mean — the classic 64-bit perceptual near-dup key for "
    "image corpora, split as two 32-bit halves (hi = rows 0-3) to stay in "
    "signed BIGINT territory on both engines.  At scale near-dup image "
    "grouping is then one groupBy on (ahash_hi, ahash_lo), the same "
    "blocking shape as dedup_simhash_buckets.",
)
def mm_bmp_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in ("doc_id", "ahash_hi", "ahash_lo")}
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                w, h, _, img = parse_bmp(bytes(payload))
                sy = (np.arange(8) * h) // 8
                sx = (np.arange(8) * w) // 8
                small = img[np.ix_(sy, sx)][:, :, 1].astype(np.int64)  # green
                mean = small.sum() / 64.0
                bits = (small > mean).astype(np.int64)
                weights = 1 << (np.arange(32, dtype=np.int64))
                hi = int((bits[:4].reshape(-1) * weights).sum())
                lo = int((bits[4:].reshape(-1) * weights).sum())
                rows["doc_id"].append(doc_id)
                rows["ahash_hi"].append(hi)
                rows["ahash_lo"].append(lo)
            yield pd.DataFrame(rows)

    return build_bmp_frame(spark, sf_dir).mapInPandas(
        kernel, "doc_id BIGINT, ahash_hi BIGINT, ahash_lo BIGINT"
    )


HAM_T = 3  # near-dup threshold; 4 disjoint 16-bit bands make blocking lossless
_N_HAM_BANDS = 4


@spec(
    f"""
    WITH {_SQL_AHASH_CTES}
    SELECT a.doc_id AS da, b.doc_id AS db,
           CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))
                + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS BIGINT) AS hamming
    FROM ah a JOIN ah b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ahash_hi, b.ahash_hi))
          + bit_count(xor(a.ahash_lo, b.ahash_lo)) <= {HAM_T}
    """,
    doc="L5+ IMAGE NEAR-DUP PAIRS by perceptual-hash hamming distance "
    f"(aHash, distance <= {HAM_T}): the image twin of dedup_simhash_buckets "
    "completing hash -> PAIRS.  Blocking is the PIGEONHOLE band join: the "
    f"64-bit aHash splits into {_N_HAM_BANDS} disjoint 16-bit bands, and "
    f"any pair within hamming {HAM_T} < {_N_HAM_BANDS} must agree EXACTLY "
    "on at least one band — so candidates come from an equi-join on "
    "(band_index, band_value), provably lossless, never an all-pairs "
    "product.  Hamming verify is two XOR+popcounts on the carried halves; "
    "multi-band matches collapse via dropDuplicates before the verify.  "
    "At 100 TB the band join shuffles 4 narrow rows per image; degenerate "
    "buckets (e.g. flat images hashing to 0) are the skew to watch — cap "
    "or salt hot band values, the dedup_minhash_lsh stop-token story.  "
    "Oracle recomputes hashes from the BMP generator's closed form and "
    "states the naive quadratic join.",
)
def mm_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = mm_bmp_ahash.builder(spark, sf_dir)
    mask = F.lit(0xFFFF).cast("long")
    bands = h.select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("bi"), F.col("ahash_hi").bitwiseAND(mask).alias("bv")
                ),
                F.struct(
                    F.lit(1).alias("bi"), F.shiftright("ahash_hi", 16).alias("bv")
                ),
                F.struct(
                    F.lit(2).alias("bi"), F.col("ahash_lo").bitwiseAND(mask).alias("bv")
                ),
                F.struct(
                    F.lit(3).alias("bi"), F.shiftright("ahash_lo", 16).alias("bv")
                ),
            )
        ).alias("band"),
    ).select("doc_id", "ahash_hi", "ahash_lo", "band.bi", "band.bv")
    x, y = bands.alias("x"), bands.alias("y")
    ham = F.bit_count(
        F.col("hi_a").bitwiseXOR(F.col("hi_b"))
    ) + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    return (
        x.join(
            y,
            (F.col("x.bi") == F.col("y.bi"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("da"),
            F.col("y.doc_id").alias("db"),
            F.col("x.ahash_hi").alias("hi_a"),
            F.col("x.ahash_lo").alias("lo_a"),
            F.col("y.ahash_hi").alias("hi_b"),
            F.col("y.ahash_lo").alias("lo_b"),
        )
        .dropDuplicates(["da", "db"])
        .withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= HAM_T)
        .select("da", "db", "hamming")
    )


VAD_WIN = 10  # samples per energy window
VAD_ENERGY_T = 9_300_000_000  # ~median window energy of the fixture corpus


@spec(
    f"""
    WITH d AS (
      SELECT doc_id, 50 + doc_id % 50 AS n, (doc_id * 7) % 65536 AS a
      FROM documents
    ),
    s AS (
      SELECT d.doc_id,
             ((d.a + g.range * 13) % 65536) - 32768 AS v,
             CAST(g.range // {VAD_WIN} AS BIGINT) AS w_idx
      FROM d, range(0, 99) g WHERE g.range < d.n
    ),
    we AS (
      SELECT doc_id, w_idx, SUM(CAST(v AS BIGINT) * v) AS energy
      FROM s GROUP BY doc_id, w_idx HAVING COUNT(*) = {VAD_WIN}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN energy > {VAD_ENERGY_T} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN energy > {VAD_ENERGY_T} THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS active_ratio
    FROM we GROUP BY doc_id
    """,
    doc="L5 audio VOICE-ACTIVITY GATE over real WAV bytes: the decoded PCM "
    f"stream is framed into {VAD_WIN}-sample windows, each window's EXACT "
    "int64 energy (sum of squares) is thresholded, and the per-asset "
    "active-window share is the curation signal (drop near-silent or "
    "dead-air audio before training — the energy-VAD every speech "
    "pipeline runs first; swap the threshold rule for a model VAD in "
    "production, the framing/aggregation shape is identical).  Trailing "
    "partial windows are excluded by the same COUNT predicate on both "
    "engines.  All window energies are exact integers; the only float "
    "output is one ratio division.  The oracle recomputes the windows "
    "from the WAV generator's closed-form samples — equality proves the "
    "real decode-frame-energy path bit-exact.  Scale: mapInPandas over "
    "the binary column, per-row independent, zero shuffle before the "
    "per-asset rollup.",
)
def mm_wav_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in ("doc_id", "n_windows", "n_active", "active_ratio")}
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as wv:
                    n = wv.getnframes()
                    samples = np.frombuffer(wv.readframes(n), dtype="<i2").astype(
                        np.int64
                    )
                full = (len(samples) // VAD_WIN) * VAD_WIN
                win = samples[:full].reshape(-1, VAD_WIN)
                energy = (win * win).sum(axis=1)
                nw = int(energy.shape[0])
                na = int((energy > VAD_ENERGY_T).sum())
                rows["doc_id"].append(doc_id)
                rows["n_windows"].append(nw)
                rows["n_active"].append(na)
                rows["active_ratio"].append(na / nw)
            out = pd.DataFrame(rows)
            out["n_windows"] = out["n_windows"].astype("int64")
            out["n_active"] = out["n_active"].astype("int64")
            yield out

    return build_wav_frame(spark, sf_dir).mapInPandas(
        kernel,
        "doc_id BIGINT, n_windows BIGINT, n_active BIGINT, active_ratio DOUBLE",
    )


QUERIES: dict[str, QuerySpec] = {
    "mm_wav_vad": mm_wav_vad,
    "mm_ahash_neardup": mm_ahash_neardup,
    "mm_video_frames": mm_video_frames,
    "mm_wav_features": mm_wav_features,
    "mm_bmp_ahash": mm_bmp_ahash,
    "mm_payload_hash": mm_payload_hash,
    "mm_decode": mm_decode,
    "mm_asset_stats": mm_asset_stats,
    "mm_resize": mm_resize,
    "mm_frame_sample": mm_frame_sample,
    "mm_bmp_decode": mm_bmp_decode,
    "mm_bmp_resize": mm_bmp_resize,
    "mm_wav_decode": mm_wav_decode,
}
