"""Differential test: ``ddic_sql_cast`` (the DuckDB oracle-authoring twin,
pkg/functions/ddic.py) against ``ddic_cast`` (the Catalyst expression every
rfc parse path uses).

The module sells ddic_sql_cast as "the DuckDB SQL twin of ddic_cast"; this
test makes the claim literal the same way tests/test_ddic_cast_diff.py did
for the executor-side _py_cast twin: both engines run the full DDIC code
set over an adversarial ASCII corpus and every (value, code) cell must
agree.

Round-12 history: the first run of this diff found 32 divergent cells plus
one crash — DuckDB's bare TRY_CAST is laxer than Spark's cast (integral
casts accepted '1.5'/'1e5'/'0x5'/'1_0' and ROUNDED; try_strptime accepted
7-digit dates and parsed 'Infinity' to 1900-01-01; doubles rejected Spark's
Java f/F/d/D suffix and accepted '1_0'), and ``from_hex`` RAISES on non-hex
input, so the old X branch could crash a whole oracle query.  Every branch
now gates on the exact grammar Spark accepts (the _py_cast regexes) before
casting.

Documented domain limit: the corpus is ASCII because DuckDB's RE2 has no
unicode digit class while Spark's DECIMAL string cast accepts unicode
digits — the RFC wire text the oracles model is ASCII, so the gap is out
of domain (pinned as accepted-divergent below, not silently skipped).
"""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.functions.ddic import (
    ddic_cast,
    ddic_sql_cast,
)

CODES = ["N", "D", "T", "P", "F", "I", "X", "C"]

HAND_PICKED = [
    "", " ", "5", "05", "+5", "-5", "1_0", "0x5", "9" * 25, "5.0", " 7 ",
    "20200130", "2020013", "202001301", "20200230", "00000000", "0000000",
    "123456", "12", "1234", "12345678", "+12345", "1x3456", "+19 284Eb",
    "1.5", "1.2345", "-0.001", "1e5", "NaN", "nan", "Infinity", "inf", "-inf",
    "1" * 40, "1.999", "2.0005", "2.5", "-2.5", "3.5", "0.0005", "-0.0005",
    "1" * 26, "1" * 30, "-" + "1" * 30, "1" * 35, "9" * 35, "9" * 35 + ".9995",
    "1E-10", "1e37", "1e40", "abcd", "AB", "ab cd", "f", "0f", "8 d",
    "ABCDEF", "xyz", "tab", "  pad  ", "1.5d", "6f", "0d", "5d", "14.02",
    "0.e6", ".5", "5.", "+.5", "-.", ".", "+", "-", "e5", ".e5",
    # whitespace classes (r12): F.trim strips ASCII space only, the
    # numeric casts trim <=0x20 internally, nothing strips \xa0/ .
    # NUL is excluded here — DuckDB VARCHAR cannot hold it, which also
    # means no oracle input can ever carry one (domain note).
    "\t5", "5\t", "\n5", "\xa05", "5\xa0", "\x0b5", "\r5", "\x1f5",
    " 5", " \t 5 \n ", "\t20200130", "\xa020200130", "\t1.5",
    "1.5\n", "\tabc", "abc\t", "\xa0AB", "\t12d",
    # exact integral type boundaries: an off-by-one in the overflow-to-NULL
    # range checks is invisible to random corpora
    "2147483647", "2147483648", "-2147483648", "-2147483649",
    "9223372036854775807", "9223372036854775808",
    "-9223372036854775808", "-9223372036854775809", "+2147483647",
]

# hostile alphabet: digits, sign/exponent/suffix letters, hex, whitespace
# (ASCII control, NBSP, line separator — no NUL, see above), and the
# NaN/Infinity letters (no unicode digits — see the module docstring's
# domain note)
ALPHA = "0123456789+-._eEfFdDxXabcdef NaninfIy\t\n\r\x0b\x1f\xa0 "


def _corpus() -> list[str]:
    rng = random.Random(20260816)
    rand = [
        "".join(rng.choice(ALPHA) for _ in range(rng.randrange(1, 12)))
        for _ in range(1200)
    ]
    return sorted(set(HAND_PICKED + rand))


def test_ddic_sql_cast_is_the_duckdb_twin_of_ddic_cast(spark):
    # P runs at three scales (0 exercises the max-literal's no-fraction
    # edge, 10 shifts the overflow band) — every other code is scale-free
    cells = [(c, 3) for c in CODES] + [("P", 0), ("P", 10)]
    corpus = _corpus()
    df = spark.createDataFrame([(v,) for v in corpus], "v STRING")
    sel = df.select(
        "v",
        *[
            ddic_cast(F.col("v"), c, decimal_scale=s).alias(f"c_{c}_{s}")
            for c, s in cells
        ],
    )
    got = {r["v"]: r for r in sel.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in corpus])
    sql = "SELECT v, " + ", ".join(
        f"{ddic_sql_cast('v', c, decimal_scale=s)} AS c_{c}_{s}" for c, s in cells
    ) + " FROM t"
    duck = {
        row[0]: dict(zip([d[0] for d in con.description], row))
        for row in con.execute(sql).fetchall()
    }

    diverged = []
    for v in corpus:
        for c, s_ in cells:
            key = f"c_{c}_{s_}"
            s, d = got[v][key], duck[v][key]
            if isinstance(s, bytearray):
                s = bytes(s)
            if isinstance(d, (bytearray, memoryview)):
                d = bytes(d)
            eq = (s == d) or (s is None and d is None)
            if isinstance(s, float) and isinstance(d, float):
                eq = (s == d) or (s != s and d != d)  # NaN == NaN here
            if not eq:
                diverged.append((c, s_, v, s, d))
    assert diverged == [], diverged[:10]
