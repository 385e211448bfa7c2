"""Local re-implementation of the driver's differential check: run a Spark
query and its DuckDB oracle, normalize, and compare values exactly.

Stricter than strictly needed (exact equality, including float bits, after
a documented normalization) so that anything passing here should also pass
the driver's order-insensitive value-hash.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, Decimal):
        # Deliberately DISTINCT from float: r02's rfc_parse_valid hash
        # failure proved the driver does NOT float Spark-side decimals
        # (Decimal('900.10') vs 900.1 hash apart), so a Decimal here only
        # matches a Decimal of equal normalized value on the other engine.
        # Registered queries must not emit DecimalType at all
        # (test_oracle_parity asserts it); this branch exists to make any
        # future decimal leak fail loudly in local parity.
        return f"dec:{v.normalize()}"
    if isinstance(v, float):
        return f"num:{v!r}"
    if isinstance(v, int):
        # Deliberately DISTINCT from float: the driver's value-hash keeps
        # integer and double columns apart ('3' vs '3.0' hash differently —
        # the round-1 fn_math failure).  An int here only matches an int on
        # the other engine.
        return f"int:{v}"
    if isinstance(v, pd.Timestamp):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.datetime):
        return f"ts:{pd.Timestamp(v).isoformat()}"
    if isinstance(v, datetime.date):
        return f"date:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    return f"str:{v}"


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return rows


def spark_to_pandas(sdf: DataFrame) -> pd.DataFrame:
    rows = sdf.collect()
    return pd.DataFrame([r.asDict() for r in rows], columns=sdf.columns)


def duck_to_pandas(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    # fetchall (python objects) rather than fetch_df: keeps DATE as
    # datetime.date and DECIMAL as Decimal, matching Spark's collect().
    return pd.DataFrame(cur.fetchall(), columns=cols)


def compare(sdf: DataFrame, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    got = spark_to_pandas(sdf)
    want = duck_to_pandas(con, sql)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns differ: spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row counts differ: spark={len(got)} duckdb={len(want)}"
    g, w = canonicalize(got), canonicalize(want)
    for i, (a, b) in enumerate(zip(g, w)):
        assert a == b, f"{name}: row {i} differs:\n  spark : {a}\n  duckdb: {b}"
