"""Lake sinks and scans (SURVEY §2.1 S4-S8).

The reference writes one S3 object per page under
``glue/result/<fmt>/<table>/<run-ts>/`` and malformed rows under a parallel
``result-err`` prefix (pyrfc_read_table.py:45-50,180-221).  Here the same
layout is produced by distributed writers: each task writes its partition's
file (the page -> object mapping the reference maintains by hand falls out of
partition-per-page planning), and the error channel is a second filtered
write over the same cached parse.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .rfc import ParsedRfc

RESULT_PREFIX = "result"  # reference: 'glue/result', pyrfc_read_table.py:47-48
ERROR_PREFIX = "result-err"  # reference: 'glue/result-err', :49-50


def run_timestamp(now: datetime | None = None) -> str:
    """Run-partition key, reference format '%Y-%m-%d-%H-%M-%S' (:45-46)."""
    now = now or datetime.now(timezone.utc)
    return now.strftime("%Y-%m-%d-%H-%M-%S")


def layout_path(base: str, prefix: str, fmt: str, table: str, run_ts: str) -> str:
    """S7 run-partitioned layout: <base>/<prefix>/<fmt>/<table>/<run_ts>/."""
    return f"{base}/{prefix}/{fmt}/{table}/{run_ts}"


@dataclass(frozen=True)
class IngestReport:
    data_path: str
    error_path: str
    valid_count: int
    err_count: int

    @property
    def total_count(self) -> int:
        return self.valid_count + self.err_count


def write_dual_sink(
    parsed: ParsedRfc,
    base: str,
    table: str,
    *,
    fmt: str = "parquet",
    run_ts: str | None = None,
) -> IngestReport:
    """S4/S5 data sink + S6 dead-letter sink in the reference's S7 layout.

    ``fmt`` is 'parquet' or 'json' (JSON-lines — what pandas
    ``orient='records', lines=True`` produced in the reference, :180-182).
    The error channel keeps the *original* WA line, like the reference's
    schema-less error file (:186,197), plus the observed arity for triage.
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    ts = run_ts or run_timestamp()
    data_path = layout_path(base, RESULT_PREFIX, fmt, table, ts)
    err_path = layout_path(base, ERROR_PREFIX, fmt, table, ts)

    # Asymmetric counting, sized for scale: the valid side (arbitrarily large)
    # is counted via observe() as a side effect of its own write — no cache,
    # no second scan; only the error side (small by construction, ~% of rows)
    # is cached for its count-then-conditionally-write sequence.  The counts
    # are the distributed twin of the reference's per-page counters
    # (pyrfc_read_table.py:119-122,151-153).
    obs = Observation()
    valid = parsed.valid.observe(obs, F.count(F.lit(1)).alias("n_valid"))
    errors = parsed.errors.cache()
    try:
        valid.write.mode("append").format(fmt).save(data_path)
        n_err = errors.count()
        if n_err:  # reference only writes an error object when err rows exist (:219-221)
            errors.write.mode("append").format(fmt).save(err_path)
        return IngestReport(data_path, err_path, int(obs.get["n_valid"]), n_err)
    finally:
        errors.unpersist()


def read_back(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S8: read the lake output back (schema round-trip check)."""
    return spark.read.format(fmt).load(path)
