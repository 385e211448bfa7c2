"""Hypothesis fuzz of the saprfc pushdown SAFETY INVARIANT.

The P7 contract (pkg/sources/saprfc_dsv2.py): accepting a filter for
pushdown is an OPTIMIZATION, never a semantics change — the source renders
what it can into server-side OPTIONS text (EQ/GT/GE/LT/LE, IN lists, LIKE
prefixes) and re-verifies EVERY accepted predicate on the typed parsed
values, so for any filter set the pushed scan must return exactly the rows
of an unpushed full scan filtered by the same predicates (three-valued SQL
semantics: a row survives iff every predicate is True; a corrupt row's
predicates evaluate against its all-NULL data columns).

This is the invariant a hand-written sweep can only spot-check; the fuzz
walks random filter combinations over every column type (C strings, N
ints, D dates), random literal types (including mismatched ones, where the
conservative _cmp returns None and the row drops), Not-wrapping, IN value
lists, and LIKE prefixes with live SQL wildcards — the exact composition
space where the round-11 In.value AttributeError hid.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.datasource import (
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.rfc import MockRfcTransport
from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import (
    OrGroup,
    SapRfcReader,
    _eval_filter,
)

FIELDS = list(MockRfcTransport.FIELDS)
COLS = [f.name for f in FIELDS]

# literals that both hit and miss the generator's value space, per type.
# The two long ones target the round-15 wire-line discipline: a ~40-char
# literal makes rendered clauses cross the 72-char OPTIONS line width
# (wrap seam), and a >72-char literal has NO legal wire form at all (its
# quoted token exceeds the char72 line), so the clause must drop to the
# unrendered ride — both replayed through the mock's width-enforcing
# re-concatenation by the laws below.
_STR_LITS = st.sampled_from(
    [
        "TAB3",
        "ROLL5",
        "X",
        "",
        "FLD_00100",
        "CHAR",
        "NUMC",
        "nope",
        "O'x",
        "WIDE_" + "w" * 35 + "'q",
        "OVER_" + "v" * 70,
    ]
)
# span the NUMC rendering bands: negative (never renders), 1-4 digits
# (zero-pads to POSITION's width 4 / LENG's width 3 when it fits), and
# wider-than-field (no order-preserving char rendering -> clause skipped,
# typed re-verify alone) — the r12-advice class the char-semantics mock
# now makes observable
_INT_LITS = st.one_of(
    st.integers(min_value=-2, max_value=510),
    st.integers(min_value=511, max_value=120_000),
)
_DATE_LITS = st.dates(
    min_value=datetime.date(1994, 12, 30), max_value=datetime.date(2020, 2, 2)
)
# None as a comparison literal: Spark folds `col = NULL` away before any
# source sees it, but the contract must hold for whatever reaches
# pushFilters — EqualTo(col, None) is never True (drops every row, both
# paths), EqualNullSafe(col, None) keeps exactly the NULL-typed rows and
# must never render (a server EQ/NE would narrow it)
_ANY_LIT = st.one_of(_STR_LITS, _INT_LITS, _DATE_LITS, st.none())

_CMP = st.sampled_from(
    [EqualTo, EqualNullSafe, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual]
)


def _filters():
    col = st.sampled_from(COLS)
    cmp_f = st.builds(lambda c, op, v: op((c,), v), col, _CMP, _ANY_LIT)
    in_f = st.builds(
        lambda c, vs: In((c,), tuple(vs)),
        col,
        # None in the list: SQL three-valued IN yields NULL (not False)
        # when nothing matches — the r11-advice band, live under Not().
        # max_size 8 since r15: longer value lists push the rendered IN
        # clause past one 72-char OPTIONS line, exercising the wrap seam
        st.lists(st.one_of(_ANY_LIT, st.none()), min_size=0, max_size=8),
    )
    sw_f = st.builds(
        lambda c, k, v: k((c,), v),
        col,
        st.sampled_from([StringStartsWith, StringEndsWith, StringContains]),
        st.sampled_from(["TAB", "FLD_01", "ROLL", "X", "%", "_", "TAB_", "RO%L", "3"]),
    )
    null_f = st.builds(lambda c, k: k((c,)), col, st.sampled_from([IsNull, IsNotNull]))
    base = st.one_of(cmp_f, in_f, sw_f, null_f)
    term = st.one_of(base, base.map(Not))
    # round-14: flat disjunctions of any simple term mix — including
    # children that render (pushed to a "( A OR B )" group, all-or-nothing)
    # next to children that don't (the whole group then rides the wire
    # unfiltered), and Not over the group (never rendered, De Morgan'd only
    # in the typed re-verify)
    or_f = st.builds(
        lambda cs: OrGroup(tuple(cs)), st.lists(term, min_size=2, max_size=3)
    )
    return st.one_of(term, or_f, or_f.map(Not))


def _scan_rows(reader: SapRfcReader) -> list[tuple]:
    rows = []
    for p in reader.partitions():
        for batch in reader.read(p):
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            rows.extend(zip(*cols))
    return rows


def _rkey(row: tuple):
    # total order over rows mixing None/str/int/date (corrupt rows carry
    # NULL data columns)
    return tuple((x is None, str(type(x)), str(x)) for x in row)


@settings(max_examples=60, deadline=None)
@given(st.lists(_filters(), min_size=1, max_size=3), st.sampled_from([7, 100]))
def test_pushdown_never_changes_semantics(filters, pagesize):
    """pushed scan == unpushed scan + the same predicates applied to the
    typed rows (True-only survival, NULL data columns for corrupt rows)."""
    opts = {"mockrows": "500", "pagesize": str(pagesize)}
    pushed = SapRfcReader(opts, FIELDS)
    leftover = list(pushed.pushFilters(list(filters)))
    assert leftover == []  # every generated shape is in _HANDLED_FILTERS
    got = sorted(_scan_rows(pushed), key=_rkey)

    plain = SapRfcReader(opts, FIELDS)
    expect = []
    for row in _scan_rows(plain):
        vals = dict(zip(COLS, row[: len(COLS)]))
        if all(_eval_filter(f, vals) is True for f in filters):
            expect.append(row)
    assert got == sorted(expect, key=_rkey)

    # PLANNING EXACTNESS LAW (round 13, the filtered-count planning): the
    # planned partitions tile [0, filtered_count) exactly — no page past
    # the server-filtered stream's end (the r12-advice wasted-round-trip
    # class), no gap before it, and the transport's filtered row_count
    # agrees with what its call() actually serves.  The semantics
    # assertion above can only catch UNDER-planning (missing rows);
    # over-planning (empty trailing round trips) needs this direct law.
    parts = pushed.partitions()
    wire_opts = pushed.wire_options()
    t = MockRfcTransport(n_rows=500)
    n_filtered = t.row_count("DD03L", wire_opts)
    assert n_filtered == len(t.call("DD03L", "`", 0, 10**9, options=wire_opts)["DATA"])
    if n_filtered:
        assert sorted((p.skip, p.count) for p in parts) == [
            (skip, min(pagesize, n_filtered - skip))
            for skip in range(0, n_filtered, pagesize)
        ]
    else:
        # degenerate empty plan: one probe partition, ROWCOUNT=1 (never 0
        # — "no restriction" to a live server)
        assert [(p.skip, p.count) for p in parts] == [(0, 1)]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(_filters(), min_size=1, max_size=2),
    st.integers(min_value=1, max_value=520),
)
def test_pushdown_composes_with_limit(filters, maxrows):
    """With maxrows, the pushed scan returns the True-surviving subset of
    the first maxrows rows OF THE SERVER-FILTERED WIRE STREAM — the
    transport filters (by its approximate OPTIONS reading) then pages, and
    the client re-verifies.  Model the server side with the transport
    itself so the law holds for ANY OPTIONS rendering strictness."""
    opts = {"mockrows": "500", "pagesize": "64", "maxrows": str(maxrows)}
    pushed = SapRfcReader(opts, FIELDS)
    list(pushed.pushFilters(list(filters)))
    got = sorted(_scan_rows(pushed), key=_rkey)

    # expected: replay the reader's own rendered OPTIONS through the
    # transport (server semantics), cap at maxrows wire rows, then apply
    # the typed re-verification
    t = MockRfcTransport(n_rows=500)
    options = pushed.wire_options()
    res = t.call("DD03L", "`", 0, maxrows, options=options)
    expect = []
    for line in res["DATA"]:
        row = _parse_like_reader(line["WA"])
        vals = dict(zip(COLS, row[: len(COLS)]))
        if all(_eval_filter(f, vals) is True for f in pushed.accepted):
            expect.append(row)
    assert got == sorted(expect, key=_rkey)


# --- stream pushdown equivalence (round 12) ---------------------------------
# The stream path's `pushdown` clause spec must be EXACTLY the batch
# contract in another syntax: for any expressible spec, a full stream drain
# equals (1) the batch reader fed the same option and (2) the batch reader
# fed the parsed Filter objects through pushFilters — Spark's own path.

_STR_COLS = ["TABNAME", "FIELDNAME", "KEYFLAG", "ROLLNAME", "DATATYPE"]
_NUM_COLS = ["POSITION", "LENG"]
# NE joined the spec grammar in round 13 (parses to Not(EqualTo))
_CMP_OPS = st.sampled_from(["EQ", "NE", "GT", "GE", "LT", "LE"])


def _q(lit: str) -> str:
    return lit.replace("'", "''")


def _spec_clauses():
    str_cmp = st.builds(
        lambda c, op, v: f"{c} {op} '{_q(v)}'",
        st.sampled_from(_STR_COLS),
        _CMP_OPS,
        st.sampled_from(["TAB3", "ROLL5", "X", "", "CHAR", "O'x", "FLD_00100"]),
    )
    num_cmp = st.builds(
        lambda c, op, v: f"{c} {op} '{v}'",
        st.sampled_from(_NUM_COLS),
        _CMP_OPS,
        st.integers(min_value=-2, max_value=510),
    )
    date_cmp = st.builds(
        lambda op, d: f"ASDATE {op} '{d:%Y%m%d}'", _CMP_OPS, _DATE_LITS
    )
    in_str = st.builds(
        lambda c, vs: f"{c} IN ({', '.join(chr(39) + _q(v) + chr(39) for v in vs)})",
        st.sampled_from(_STR_COLS),
        st.lists(
            st.sampled_from(["TAB3", "ROLL5", "X", "nope", "O'x"]),
            min_size=1,
            max_size=3,
        ),
    )
    in_num = st.builds(
        lambda c, vs: f"{c} IN ({', '.join(chr(39) + str(v) + chr(39) for v in vs)})",
        st.sampled_from(_NUM_COLS),
        st.lists(st.integers(min_value=0, max_value=510), min_size=1, max_size=3),
    )
    like = st.builds(
        lambda c, op, v: f"{c} {op} '{_q(v)}'",
        st.sampled_from(_STR_COLS),
        st.sampled_from(["STARTSWITH", "ENDSWITH", "CONTAINS"]),
        st.sampled_from(["TAB", "7", "L1", "FLD_01", "%", "_", "O'x", "3"]),
    )
    simple = st.one_of(str_cmp, num_cmp, date_cmp, in_str, in_num, like)
    # round-14 OR within a clause; literal "A OR B" exercises the
    # quote-aware term split on the parse side
    or_lit = st.builds(
        lambda c, v: f"{c} EQ '{_q(v)}'",
        st.sampled_from(_STR_COLS),
        st.sampled_from(["A OR B", "x' OR TABNAME EQ 'y"]),
    )
    or_clause = st.builds(
        " OR ".join, st.lists(st.one_of(simple, or_lit), min_size=2, max_size=3)
    )
    return st.one_of(simple, or_lit, or_clause)


@settings(max_examples=40, deadline=None)
@given(st.lists(_spec_clauses(), min_size=1, max_size=3), st.sampled_from([64, 300]))
def test_stream_pushdown_equals_batch_pushdown(clauses, pagesize):
    """stream drain with `pushdown` == batch scan with the same option ==
    batch scan with the parsed Filters pushed through pushFilters."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import (
        SapRfcStreamReader,
        parse_pushdown_spec,
    )

    spec = "; ".join(clauses)
    opts = {"mockrows": "500", "pagesize": str(pagesize), "pushdown": spec}
    stream = SapRfcStreamReader(opts, FIELDS)
    s_rows = []
    for p in stream.partitions(stream.initialOffset(), stream.latestOffset()):
        for batch in stream.read(p):
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            s_rows.extend(zip(*cols))
    s_rows = sorted(s_rows, key=_rkey)

    b_option = SapRfcReader(opts, FIELDS)
    assert sorted(_scan_rows(b_option), key=_rkey) == s_rows

    b_pushed = SapRfcReader({"mockrows": "500", "pagesize": str(pagesize)}, FIELDS)
    leftover = list(b_pushed.pushFilters(parse_pushdown_spec(spec, FIELDS)))
    assert leftover == []
    assert sorted(_scan_rows(b_pushed), key=_rkey) == s_rows


def _parse_like_reader(wa: str):
    """Typed parse of one wire line, mirroring SapRfcReader.read's branch:
    arity mismatch -> all-NULL data columns + the raw line in the corrupt
    channel; else per-field _py_cast."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import _py_cast

    parts = wa.strip(" ").split("`")  # F.trim twin: ASCII space only
    if len(parts) != len(FIELDS):
        return tuple([None] * len(FIELDS) + [wa])
    return tuple([_py_cast(p, f) for f, p in zip(FIELDS, parts)] + [None])
