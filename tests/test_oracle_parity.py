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
ROWS_ONLY_NAMES = [n for n, q in REG.items() if q.oracle is None]


def _assert_no_decimal(df, name):
    # r02 driver lesson: DECIMAL output hash-mismatches even when values are
    # numerically identical (the two engines canonicalize it differently).
    # Registered surfaces emit DOUBLE/BIGINT instead; decimal stays internal.
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, f"{name}: registered query emits DecimalType columns {bad}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, sf_dir, name):
    q = REG[name]
    df = q.builder(spark, sf_dir)
    _assert_no_decimal(df, name)
    compare(df, duck, q.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    q = REG[name]
    df = q.builder(spark, sf_dir)
    _assert_no_decimal(df, name)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
