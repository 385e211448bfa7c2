"""Differential test: ``_py_cast`` (the saprfc DSv2's executor-side parse,
pkg/sources/saprfc_dsv2.py) against ``ddic_cast`` (the Catalyst expression
the rfc.py parse path uses, pkg/functions/ddic.py).

The DSv2 docstring calls _py_cast the "executor-side twin" of ddic_cast —
this test makes the claim literal: both run over an adversarial corpus
(hand-picked divergence candidates + seeded random strings over a hostile
alphabet) for every DDIC code, and every (value, code) cell must agree.

Round-11 history: the first run of this diff found 32 divergences, several
crash-capable — Python's int()/Decimal() accept underscores and unicode
digits and unbounded magnitudes (an overflowing int64 or a Decimal('NaN')
crashes the Arrow RecordBatch build instead of nulling), Python's
bytes.fromhex allows whitespace while unhex does not but pads odd lengths,
Decimal kept full precision where Spark rounds HALF_UP to the declared
scale, and the 8-char date parse accepted 7- and 9-char strings.  The
empirically-surprising Spark behaviors are pinned here too: its DECIMAL
string cast accepts unicode digits while its integral/double casts do not,
its double cast accepts a Java trailing f/F/d/D suffix (only flush against
the number), and try_cast trims each substring slice in the T composition.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.functions.ddic import ddic_cast
from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.rfc import RfcField
from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import _py_cast

CODES = ["N", "D", "T", "P", "F", "I", "X", "C"]

HAND_PICKED = [
    "", " ", "5", "05", "+5", "-5", "1_0", "٥", "0x5", "9" * 25, "5.0", " 7 ",
    "20200130", "2020013", "202001301", "20200230", "00000000", "0000000",
    "123456", "12", "1234", "12345678", "+12345", "1x3456", "+19 284Eb",
    "1.5", "1.2345", "-0.001", "1e5", "NaN", "nan", "Infinity", "inf", "-inf",
    "1" * 40, "1.999", "2.0005", "2.5", "-2.5", "3.5", "0.0005", "-0.0005",
    # the 29-38-significant-digit band (r11 advice): quantize under the
    # default prec=28 context raised InvalidOperation here while Spark's
    # try_cast to decimal(38,3) keeps up to 38 total digits — _py_cast now
    # widens the context so the band agrees (and the >38 overflow check is
    # live again).  '9'*35+'.9995' pins the rounding-carry edge: HALF_UP
    # carries to 10^35, 39 total digits -> NULL on both sides.
    "1" * 26, "1" * 30, "-" + "1" * 30, "1" * 30 + ".5", "1" * 35,
    "9" * 35, "9" * 35 + ".9995", "9" * 35 + ".9994", "1" * 36,
    "1E-10", "1e37", "1e40", "abcd", "AB", "ab cd", "f", "0f", "8 d",
    "ABCDEF", "xyz", "tab", "  pad  ", "1.٥", "٥.2", "1e٥", "٥e2", "-٥", "+٥",
    # the whitespace classes (r12 differential — 59 divergent cells on the
    # first probe): Spark's F.trim strips ONLY the ASCII space, its
    # numeric casts internally trim <=0x20 (tab/newline/NUL included), and
    # NOTHING strips unicode whitespace like \xa0 — where Python's bare
    # str.strip() ate everything.  Both directions were live: '\xa05'
    # parsed in Python but NULLs in Spark; '\x005' NULLed in Python but
    # parses in Spark.
    "\t5", "5\t", "\n5", "\xa05", "5\xa0", "\x005", "5\x00", "\x0b5",
    "\r5", "\x1f5", " 5", " \t 5 \n ", "\t20200130", "\xa020200130",
    "\t1.5", "1.5\n", "1.5\x00", "\tabc", "abc\t", "\xa0AB", "\t12d",
    # exact integral type boundaries: an off-by-one in the overflow-to-NULL
    # range checks is invisible to random corpora
    "2147483647", "2147483648", "-2147483648", "-2147483649",
    "9223372036854775807", "9223372036854775808",
    "-9223372036854775808", "-9223372036854775809", "+2147483647",
]

# hostile alphabet: digits, sign/exponent/suffix letters, hex, unicode
# digits, whitespace (ASCII control, NUL, NBSP, line separator), and the
# NaN/Infinity letters
ALPHA = "0123456789+-._eEfFdDxXabcdef ٥۳NaninfIy\t\n\r\x00\x0b\x1f\xa0 "


def _corpus() -> list[str]:
    rng = random.Random(20260816)
    rand = [
        "".join(rng.choice(ALPHA) for _ in range(rng.randrange(1, 12)))
        for _ in range(1200)
    ]
    return sorted(set(HAND_PICKED + rand))


def test_py_cast_is_the_literal_twin_of_ddic_cast(spark):
    # P runs at three scales (0 and 10 shift the quantize band and the
    # overflow boundary the r11 advice found broken at the default prec)
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
    diverged = []
    for v in corpus:
        for c, s in cells:
            py = _py_cast(v, RfcField("X", c, decimal_scale=s))
            sp = got[v][f"c_{c}_{s}"]
            if isinstance(sp, bytearray):
                sp = bytes(sp)
            eq = (py == sp) or (py is None and sp is None)
            if isinstance(py, float) and isinstance(sp, float):
                eq = (py == sp) or (py != py and sp != sp)  # NaN == NaN here
            if not eq:
                diverged.append((c, s, v, py, sp))
    assert diverged == [], diverged[:10]
