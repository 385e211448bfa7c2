"""Differential test: every registered oracle-checked query must match its
DuckDB oracle exactly — the local twin of the driver's correctness gate.

Runs at sf0.001 by default (fast); ``SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01``
reproduces the driver's scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import DecimalType

import __spark_entry__ as entrymod
from tests.oracle_harness import compare

REG = entrymod._registry()
ORACLE_NAMES = [n for n, q in REG.items() if q.oracle is not None]
# since r9 every registry query carries an oracle (pinned in
# tests/test_registry.py); no rows-only parametrization remains

# ---------------------------------------------------------------------------
# sf0.1 CI sweep (r7 verdict item 5): the full-registry differential sweep at
# /root/testdata/sf0.1 is ONE command —
#
#   SPARK_GRAFT_TEST_SF=/root/testdata/sf0.1 python -m pytest \
#       tests/test_oracle_parity.py -q
#
# — with the documented exceptions below auto-skipped (they are exceptions of
# the ORACLE or of an SF-level measurement, not of the operators, each of
# which stays covered at the driver SFs).  Recorded green runs live in
# SURVEY.md §5.2.4.
# ---------------------------------------------------------------------------
_SF01_SWEEP_EXCLUDE = {
    # CC-family closures: the oracle is a recursive-CTE transitive closure
    # over the ~7M-pair verified-pair graph — intractable in DuckDB at
    # sf0.1.  The shared contraction kernel is closure-checked at sf0.01
    # and at sf0.1 via graph_components' sparse graph (which DOES run here).
    "dedup_connected_components": "recursive-CTE closure oracle intractable in DuckDB at sf0.1",
    "dedup_cluster_canonical": "recursive-CTE closure oracle intractable in DuckDB at sf0.1",
    # recall anchor: banding shows its first probabilistic misses at sf0.1
    # (3 of 5,114,528 qualifying pairs, recall 0.9999994 — documented in the
    # operator); the exact-equality oracle is an SF-level measurement.
    "dedup_minhash_recall": "LSH recall is probabilistic at sf0.1 (3/5.1M missed; exact at driver SFs)",
    # same SF-level measurement, aggregate form: all_found flips FALSE on
    # those 3 probabilistic misses at sf0.1
    "dedup_minhash_lsh": "LSH recall is probabilistic at sf0.1 (3/5.1M missed; exact at driver SFs)",
}


def _sweep_skip(name: str, sf_dir: str) -> str | None:
    if not sf_dir.rstrip("/").endswith("sf0.1"):
        return None
    if name.startswith("stream_"):
        # streaming horizon/tie engineering (watermark schedules, final-
        # watermark session cuts) is pinned to the driver SFs; the batch-
        # equivalence oracles hold there by construction.
        return "streaming horizon engineering is pinned to the driver SFs"
    return _SF01_SWEEP_EXCLUDE.get(name)


def _assert_no_decimal(df, name):
    # r02 driver lesson: DECIMAL output hash-mismatches even when values are
    # numerically identical (the two engines canonicalize it differently).
    # Registered surfaces emit DOUBLE/BIGINT instead; decimal stays internal.
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, f"{name}: registered query emits DecimalType columns {bad}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, sf_dir, name):
    reason = _sweep_skip(name, sf_dir)
    if reason:
        pytest.skip(f"sf0.1 sweep exception: {reason}")
    q = REG[name]
    df = q.builder(spark, sf_dir)
    _assert_no_decimal(df, name)
    compare(df, duck, q.oracle, name)


# DuckDB types whose dataframe/arrow fetch matches a Spark integral column.
# HUGEINT/UHUGEINT are the trap: DuckDB's df fetch converts them to float64
# (the r03 q12_late_shipments hash failure — SUM(int) promotes to HUGEINT),
# while fetchall() hands back Python ints and masks the mismatch.  UBIGINT
# fetches as uint64 and is excluded for the same reason.
_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER"}


def _duck_type_ok(spark_type, duck_type: str) -> bool:
    from pyspark.sql import types as T

    duck_type = duck_type.upper()
    if isinstance(spark_type, T.ArrayType):
        return duck_type.endswith("[]") and _duck_type_ok(
            spark_type.elementType, duck_type[:-2]
        )
    if isinstance(spark_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return duck_type in _DUCK_INT
    if isinstance(spark_type, (T.DoubleType, T.FloatType)):
        return duck_type in ("DOUBLE", "FLOAT")
    if isinstance(spark_type, T.BooleanType):
        return duck_type == "BOOLEAN"
    if isinstance(spark_type, T.StringType):
        return duck_type == "VARCHAR"
    if isinstance(spark_type, T.DateType):
        return duck_type == "DATE"
    if isinstance(spark_type, T.TimestampType):
        return duck_type.startswith("TIMESTAMP")
    if isinstance(spark_type, T.BinaryType):
        return duck_type == "BLOB"
    if isinstance(spark_type, T.MapType):
        return duck_type.startswith("MAP")
    return True  # struct/other: value comparison still covers it


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_dtype_parity(spark, duck, sf_dir, name):
    """Static cross-engine TYPE sweep (VERDICT r03 item 1): DESCRIBE the
    oracle (no execution) and require every column's DuckDB type to fetch —
    via the driver's dataframe/arrow path — into the same value family as
    the Spark column.  Catches integer SUMs left to promote to HUGEINT
    before they can hash-mismatch in a driver round."""
    q = REG[name]
    duck_types = {
        r[0]: r[1] for r in duck.execute(f"DESCRIBE {q.oracle}").fetchall()
    }
    sdf = q.builder(spark, sf_dir)
    assert sorted(duck_types) == sorted(sdf.columns), name
    bad = [
        (f.name, str(f.dataType), duck_types[f.name])
        for f in sdf.schema.fields
        if not _duck_type_ok(f.dataType, duck_types[f.name])
    ]
    assert not bad, f"{name}: spark/duckdb dtype families differ: {bad}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
