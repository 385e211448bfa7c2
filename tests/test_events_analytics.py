"""Edge-case pins for the round-7 event-analytics operators: cross-engine
week-truncation parity at year boundaries (the one place Spark and DuckDB
could silently disagree on ISO semantics) and transition-matrix tie
handling.  The fixture-level oracle gate covers the driver's data; these
synthetic frames cover calendars the fixture never exercises."""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F


def test_week_trunc_parity_at_year_boundaries(spark):
    """date_trunc('week', ts) must agree between Spark and DuckDB for
    timestamps around ISO-week/year boundaries (Jan 1 falling mid-week,
    leap years, week 53)."""
    stamps = [
        "2020-12-31 23:59:59",  # ISO week 53 of 2020
        "2021-01-01 00:00:00",  # same ISO week, new calendar year
        "2021-01-04 00:00:00",  # Monday, week 1 of 2021
        "2024-02-29 12:00:00",  # leap day
        "2026-01-01 08:00:00",  # Thursday
        "1999-12-31 00:00:00",
        "2000-01-03 00:00:00",
    ]
    df = spark.createDataFrame(
        [(dt.datetime.fromisoformat(s),) for s in stamps], ["ts"]
    )
    got = {
        r["ts"].isoformat(sep=" "): r["wk"]
        for r in df.select(
            "ts", F.date_trunc("week", "ts").alias("wk")
        ).collect()
    }
    con = duckdb.connect()
    for s in stamps:
        # NB: DuckDB returns DATE for day-or-coarser truncation; the query
        # surface compares the strftime'd day, so normalize both to that
        (wk,) = con.execute(
            f"SELECT date_trunc('week', TIMESTAMP '{s}')"
        ).fetchone()
        spark_wk = got[s]
        assert spark_wk.strftime("%Y-%m-%d") == wk.strftime("%Y-%m-%d"), (
            s, spark_wk, wk,
        )
        # and every truncated value is a Monday at midnight
        assert wk.weekday() == 0, (s, wk)
        assert (spark_wk.hour, spark_wk.minute) == (0, 0), (s, spark_wk)


def test_retention_offsets_divide_exactly(spark):
    """Both endpoints of the offset subtraction are week-truncated, so the
    day difference is always a multiple of 7 — the /7 cast never rounds."""
    stamps = [
        ("2020-12-28 00:00:00", "2021-01-08 10:00:00"),  # across new year
        ("2024-02-26 00:00:00", "2024-03-04 00:00:00"),  # across leap day
    ]
    rows = [
        (dt.datetime.fromisoformat(a), dt.datetime.fromisoformat(b))
        for a, b in stamps
    ]
    df = spark.createDataFrame(rows, ["t0", "t1"]).select(
        F.datediff(
            F.date_trunc("week", "t1"), F.date_trunc("week", "t0")
        ).alias("d")
    )
    for r in df.collect():
        assert r["d"] % 7 == 0, r


def test_transitions_orderby_breaks_ts_ties_deterministically(spark):
    """Two events with an identical timestamp must order by event_id in the
    lead() window, matching the oracle's ORDER BY ts, event_id."""
    ts = dt.datetime(2026, 1, 5, 9, 0, 0)
    rows = [
        (1, ts, 7, "a"),
        (2, ts, 7, "b"),  # same ts, higher id -> second
        (3, ts + dt.timedelta(minutes=1), 7, "c"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    got = {
        r["event_type"]: r["nxt"]
        for r in df.select(
            "event_type", F.lead("event_type").over(w).alias("nxt")
        ).collect()
    }
    assert got == {"a": "b", "b": "c", "c": None}
