"""Differential test: the engine's TWO wire-parse paths must type the same
text identically.

The reference's parse (split -> arity split -> trim -> cast) is
implemented twice, deliberately: once as a declarative DataFrame pipeline
(``sources/rfc.py parse_rfc_frame`` — F.trim + F.split + ddic_cast, the
path the rfc_* queries use) and once as the DSv2 reader's executor-side
Python loop (``saprfc_dsv2.SapRfcReader.read`` — str.split + _py_cast,
which this test mirrors line-for-line).  The cast layer is already pinned
by tests/test_ddic_cast_diff.py; this suite pins the COMPOSITION — line
trim, literal split (regex-metacharacter delimiters included), arity
split, per-field cast — over randomized hostile lines: whitespace classes
at both line and cell level, embedded delimiters (corrupt rows), empty
cells, every DDIC type code.

Why it matters: round 12 found the two paths diverged on any wire text
with non-space whitespace (str.strip() vs F.trim — 59 divergent cast
cells), a class the fixture corpus can never produce.  A user switching a
table from the mapInPandas path to the DSv2 source must see identical
typed rows.
"""

from __future__ import annotations

import random

from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.rfc import (
    RfcField,
    parse_rfc_frame,
)
from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import (
    _py_cast,
)

CODES = ["N", "D", "T", "P", "F", "I", "X", "C"]

# hostile cell alphabet: digits, cast-significant letters, whitespace
# classes (tab/newline/CR/NUL/vertical-tab/NBSP/line-separator), quotes
ALPHA = "0123456789+-._eEfFdD abcXY\t\n\r\x00\x0b\xa0 '"


def _lines(rng: random.Random, delim: str, n_fields: int, n_lines: int) -> list[str]:
    alpha = ALPHA.replace(delim, "")  # embedded delims only via injection
    out = []
    for _ in range(n_lines):
        cells = []
        for _ in range(n_fields):
            s = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 9)))
            if rng.random() < 0.06:
                s += delim  # stray delimiter -> arity mismatch (corrupt)
            cells.append(s)
        line = delim.join(cells)
        if rng.random() < 0.15:
            line = " " + line + "  "  # outer spaces: line-level trim
        out.append(line)
    return out


def _key(row: tuple):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def test_dataframe_parse_equals_reader_parse(spark):
    rng = random.Random(20260816)
    for delim in ("`", "|", ".", "~"):  # incl. regex metacharacters
        fields = [RfcField(f"C{i}", code) for i, code in enumerate(CODES)]
        n = len(fields)
        lines = _lines(rng, delim, n, 400)

        # the DSv2 reader's branch, verbatim (saprfc_dsv2.SapRfcReader.read)
        py_valid, py_err = [], []
        for line in lines:
            parts = line.strip(" ").split(delim)
            if len(parts) != n:
                py_err.append(line)
            else:
                py_valid.append(
                    tuple(_py_cast(p, f) for f, p in zip(fields, parts))
                )

        raw = spark.createDataFrame([(ln,) for ln in lines], "wa STRING")
        parsed = parse_rfc_frame(raw, fields, delimiter=delim)
        sp_valid = [
            tuple(bytes(x) if isinstance(x, bytearray) else x for x in r)
            for r in parsed.valid.collect()
        ]
        sp_err = [r["wa"] for r in parsed.errors.collect()]

        assert sorted(sp_err) == sorted(py_err), (delim, "error split")
        assert sorted(sp_valid, key=_key) == sorted(py_valid, key=_key), (
            delim,
            "typed rows",
        )
