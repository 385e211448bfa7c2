"""Randomized parse-pipeline check: seeded random WA payloads (arbitrary
arity, padding, junk numerics, initial dates) through parse_rfc_frame must
reproduce a plain-Python reference parse exactly, and the count invariant
valid + err = total must hold for every sample."""

from __future__ import annotations

import datetime
import random

from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.rfc import (
    RfcField,
    parse_rfc_frame,
)

FIELDS = [RfcField("k", "N"), RfcField("name", "C"), RfcField("d", "D"), RfcField("f", "F")]


def _gen_wa(rng: random.Random) -> str:
    k = rng.choice([f"{rng.randrange(10**4):06d}", "x9x", ""])
    name = rng.choice([" padded ", "plain", "  ", "with space inside"])
    d = rng.choice(["00000000", "19991231", "20240230", "junk", ""])
    f = rng.choice(["1.5", "-3.25e2", "nope", ""])
    vals = [k, name, d, f]
    r = rng.random()
    if r < 0.15:
        vals.append("extra")  # arity high
    elif r < 0.30:
        vals.pop()  # arity low
    return "`".join(vals)


def _ref_parse(wa: str):
    parts = wa.strip().split("`")
    if len(parts) != 4:
        return None  # error channel
    k, name, d, f = (p.strip() for p in parts)
    try:
        kk = int(k)
    except ValueError:
        kk = None
    dd = None
    if d and d != "00000000":
        try:
            dd = datetime.datetime.strptime(d, "%Y%m%d").date()
        except ValueError:
            dd = None
    try:
        ff = float(f)
    except ValueError:
        ff = None
    return (kk, name, dd, ff)


def test_parse_matches_python_reference(spark):
    rng = random.Random(20260813)
    was = [_gen_wa(rng) for _ in range(500)]
    raw = spark.createDataFrame([(w,) for w in was], "wa STRING")
    parsed = parse_rfc_frame(raw, FIELDS)

    got_valid = sorted(map(tuple, parsed.valid.collect()), key=repr)
    want_valid = sorted((t for t in map(_ref_parse, was) if t is not None), key=repr)
    assert got_valid == want_valid

    n_err_want = sum(1 for w in was if _ref_parse(w) is None)
    assert parsed.errors.count() == n_err_want
    assert len(got_valid) + n_err_want == 500
