"""Deterministic streaming replay harness (SURVEY §5.2 item 3).

Structured Streaming's file source processes files in modification-time
order, so we materialize the ``events`` fixture as N chunk files with
explicitly increasing mtimes and read them back with
``maxFilesPerTrigger=1`` + ``Trigger.AvailableNow`` — every run yields the
identical microbatch sequence (never wall-clock-dependent, per SURVEY §7
"deterministic replay via foreachBatch, never wall-clock").

Variants plant scenario-specific rows:

* ``ordered`` — events sorted by (ts, event_id), chunked contiguously: the
  normal in-order arrival stream.
* ``dups``    — every 10th event_id is duplicated inside its chunk
  (arrives twice within any reasonable watermark) — exercises T5.
* ``late``    — events with event_id % 97 == 0 are withheld from their
  ts-ordered chunk and appended to the final chunk, so they arrive days
  late — exercises T4 watermark drops.
* ``bad``     — props of event_id % 101 == 0 corrupted to ``'{bad'`` —
  exercises the T8 dead-letter split.

The harness is a *test device*: it intentionally materializes the (small)
fixture via pandas on the driver.  Production streams read Kafka/files
directly; every operator in ``ops.py`` is plain Structured Streaming and
never touches this module's internals.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load

N_CHUNKS = 4

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)

_SCRATCH = os.path.join(os.path.dirname(__file__), "..", "..", ".scratch")


def scratch_dir(kind: str) -> str:
    d = os.path.abspath(os.path.join(_SCRATCH, kind, uuid.uuid4().hex))
    os.makedirs(d, exist_ok=True)
    return d


_REPLAY_CACHE: dict[tuple[str, str], str] = {}


def build_replay(spark: SparkSession, sf_dir: str, variant: str = "ordered") -> str:
    """Materialize the events fixture as N_CHUNKS mtime-ordered parquet files;
    returns the directory to point ``readStream`` at.  Cached per
    (sf_dir, variant) within the process — the chunk content is a pure
    function of both."""
    cached = _REPLAY_CACHE.get((sf_dir, variant))
    if cached is not None and os.path.isdir(cached):
        return cached
    pdf = (
        load(spark, sf_dir, "events")
        .orderBy("ts", "event_id")
        .toPandas()
    )
    if variant == "bad":
        mask = pdf["event_id"] % 101 == 0
        pdf.loc[mask, "props"] = "{bad"

    n = len(pdf)
    bounds = [round(i * n / N_CHUNKS) for i in range(N_CHUNKS + 1)]
    chunks = [pdf.iloc[bounds[i] : bounds[i + 1]].copy() for i in range(N_CHUNKS)]

    if variant == "dups":
        chunks = [
            __import__("pandas").concat([c, c[c["event_id"] % 10 == 0]], ignore_index=True)
            for c in chunks
        ]
    elif variant == "late":
        late_mask = pdf["event_id"] % 97 == 0
        chunks = [c[c["event_id"] % 97 != 0].copy() for c in chunks]
        chunks[-1] = __import__("pandas").concat(
            [chunks[-1], pdf[late_mask]], ignore_index=True
        )
    elif variant not in ("ordered", "bad"):
        raise ValueError(f"unknown replay variant {variant!r}")

    out = scratch_dir(f"replay-{variant}")
    base_mtime = 1_600_000_000
    for i, c in enumerate(chunks):
        path = os.path.join(out, f"chunk_{i:03d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(c, preserve_index=False),
            path,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(path, (base_mtime + i, base_mtime + i))
    _REPLAY_CACHE[(sf_dir, variant)] = out
    return out


def read_events_stream(
    spark: SparkSession, replay_path: str, files_per_trigger: int | None = 1
) -> DataFrame:
    """``files_per_trigger=1`` (default) forces one microbatch per replay
    chunk — required wherever results depend on batch boundaries (watermark
    advancement, dropDuplicatesWithinWatermark eviction, stateful updates,
    per-batch dead-letter writes).  Batch-count-insensitive ops (complete-mode
    window aggs, stateless stream-static joins) pass ``None`` to let
    Trigger.AvailableNow drain all files in one batch — the scale posture:
    size microbatches to amortize per-batch overhead, don't fix them at one
    file."""
    # oracle-parity for date_format output is timezone-sensitive; pin UTC
    # even when the host session (e.g. the driver's) is configured otherwise
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", files_per_trigger)
    return r.parquet(replay_path)


STREAM_SHUFFLE_PARTITIONS = 8


class stream_shuffle:
    """Scope ``spark.sql.shuffle.partitions`` down for a streaming drain.

    The shuffle-partition conf IS the streaming state sizing knob: it fixes
    the number of state-store instances at checkpoint creation, and every
    microbatch pays per-store open/commit overhead.  The fixture's
    microbatches are small, so 8 stores halve drain time vs 32 (measured:
    stream-stream join 13.6s -> 5.1s); a production job sizes this to its
    per-batch volume before first start — the same knob, a bigger number.
    Batch queries are unaffected (conf restored on exit; AQE coalesces
    batch shuffles anyway)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set(
            "spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS)
        )

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        return False


def run_to_table(sdf: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Drain the stream with Trigger.AvailableNow into a memory sink and
    return the sink table (driver collects it — test-scale only; production
    sinks are parquet/Kafka via the same writeStream call)."""
    spark = sdf.sparkSession
    with stream_shuffle(spark):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", scratch_dir("ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
