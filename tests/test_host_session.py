"""Hostile-host-session hardening: the driver runs our queries on ITS
SparkSession, which may be non-UTC and lack this engine's conf defaults.
Every run-time-sensitive path must pin what it needs (catalog._load_events
and streaming replay pin UTC; saprfc register() sets Python-source filter
pushdown) — these tests flip the session into a hostile state, run the
sensitive queries, and restore."""

from __future__ import annotations

import contextlib

import pytest

import __spark_entry__ as entrymod

REG = entrymod._registry()

# queries whose output contains formatted timestamps / date arithmetic over
# the events table, or that traverse the Python data source
SENSITIVE = [
    "stream_tumbling_agg",
    "stream_static_join",
    "fn_datetime",
    "saprfc_pushdown",
    "mm_bmp_decode",
]


@contextlib.contextmanager
def hostile(spark):
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


@pytest.mark.parametrize("name", SENSITIVE)
def test_query_survives_non_utc_host_session(spark, sf_dir, duck, name):
    from tests.oracle_harness import compare

    with hostile(spark):
        df = REG[name].builder(spark, sf_dir)
        oracle = REG[name].oracle
        if oracle is None:
            assert df.count() >= 0
        else:
            compare(df, duck, oracle, name)
