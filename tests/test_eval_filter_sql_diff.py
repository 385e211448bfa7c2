"""Differential pin: ``_eval_filter`` vs DuckDB's ANSI three-valued WHERE.

``_eval_filter`` is the saprfc source's typed re-verification evaluator —
the single function that decides which parsed rows survive a pushed
predicate (batch and stream), including round-14's three-valued OR.  Its
semantics CLAIM to be SQL's: True survives, False and NULL drop, NOT
flips through NULL, IN is an OR of equalities, ``<=>`` is IS NOT DISTINCT
FROM.  Until now that claim was pinned only transitively (the
pushed==unpushed fuzz compares the evaluator against itself on both
sides; the oracle gate checks two fixed filter sets end-to-end).  This
suite pins it against a genuinely independent implementation: the same
typed rows loaded into DuckDB (corrupt all-NULL rows included) and the
same filters rendered as ANSI SQL — per the differential-fuzz doctrine
that found the In.value/_cmp/ddic divergences in rounds 11-12.

Domain note: literals are COLUMN-TYPED (the renderable domain).  The
evaluator's conservative cross-type behavior (``_cmp`` returns None on a
str-vs-int compare) has no SQL twin by design — SQL would coerce or
error — so mistyped literals are out of scope here and covered by the
fail-loud render/parse validation instead.  String predicates target
string columns only, mirroring both Spark's analyzer and the spec
grammar's guard.  NUL bytes are excluded from the literal space (DuckDB
VARCHAR cannot hold them — the documented SQL-twin domain limit).
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
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
    _eval_filter,
    _py_cast,
)

FIELDS = list(MockRfcTransport.FIELDS)
COLS = [f.name for f in FIELDS]
_STR_COLS = [f.name for f in FIELDS if f.type_code == "C"]
_NUM_COLS = [f.name for f in FIELDS if f.type_code == "N"]


def _typed_rows(n: int = 500) -> list[dict]:
    t = MockRfcTransport(n_rows=n)
    rows = []
    for line in t.call("DD03L", "`", 0, n)["DATA"]:
        parts = line["WA"].strip(" ").split("`")
        if len(parts) != len(FIELDS):
            rows.append(dict.fromkeys(COLS))
        else:
            rows.append({f.name: _py_cast(p, f) for f, p in zip(FIELDS, parts)})
    return rows


_ROWS = _typed_rows()

_PA_TYPES = {"C": pa.string(), "N": pa.int64(), "D": pa.date32()}


def _duck() -> duckdb.DuckDBPyConnection:
    cols = {"rid": pa.array(range(len(_ROWS)), type=pa.int64())}
    for f in FIELDS:
        cols[f.name] = pa.array(
            [r[f.name] for r in _ROWS], type=_PA_TYPES[f.type_code]
        )
    con = duckdb.connect()
    con.register("t", pa.table(cols))
    return con


_CON = _duck()

_SQL_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}
_SQL_FNS = {
    StringStartsWith: "starts_with",
    StringEndsWith: "ends_with",
    StringContains: "contains",
}


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, datetime.date):
        return f"DATE '{v:%Y-%m-%d}'"
    return str(v)


def _sql_of(flt) -> str:
    """ANSI SQL text of one Filter — the independent semantics DuckDB
    evaluates (string predicates via starts_with/ends_with/contains, NOT
    LIKE, so wildcard characters in literals stay literal)."""
    if isinstance(flt, Not):
        return f"(NOT {_sql_of(flt.child)})"
    if isinstance(flt, OrGroup):
        return "(" + " OR ".join(_sql_of(c) for c in flt.children) + ")"
    if isinstance(flt, In):
        if not flt.value:
            # Spark's In.eval null-checks BEFORE the (empty) list walk, so
            # NULL IN () is NULL, not FALSE — Catalyst's OptimizeIn rewrites
            # an empty nullable IN to If(IsNotNull(v), false, null) for the
            # same reason.  DuckDB rejects the () syntax outright, so spell
            # the Spark semantics out.  (This cell is the suite's first
            # catch: the naive FALSE rendering diverged from _eval_filter
            # under Not() on the corrupt all-NULL rows — and _eval_filter,
            # which returns None there, matches Spark.)
            c = flt.attribute[-1]
            return f"(CASE WHEN {c} IS NULL THEN NULL ELSE FALSE END)"
        vals = ", ".join(_sql_lit(v) for v in flt.value)
        return f"({flt.attribute[-1]} IN ({vals}))"
    if isinstance(flt, IsNull):
        return f"({flt.attribute[-1]} IS NULL)"
    if isinstance(flt, IsNotNull):
        return f"({flt.attribute[-1]} IS NOT NULL)"
    if isinstance(flt, EqualNullSafe):
        return f"({flt.attribute[-1]} IS NOT DISTINCT FROM {_sql_lit(flt.value)})"
    if type(flt) in _SQL_OPS:
        return f"({flt.attribute[-1]} {_SQL_OPS[type(flt)]} {_sql_lit(flt.value)})"
    return f"{_SQL_FNS[type(flt)]}({flt.attribute[-1]}, {_sql_lit(flt.value)})"


# column-typed literal spaces (None included: `col = NULL` must drop every
# row in BOTH implementations, and None inside IN lists drives the
# three-valued no-match band)
_STR_LITS = st.sampled_from(
    ["TAB3", "ROLL5", "X", "", "FLD_00100", "CHAR", "O'x", "%", "_", "a b", None]
)
_INT_LITS = st.one_of(st.integers(min_value=-2, max_value=510), st.none())
_DATE_LITS = st.one_of(
    st.dates(
        min_value=datetime.date(1994, 12, 30), max_value=datetime.date(2020, 2, 2)
    ),
    st.none(),
)
_CMP = st.sampled_from(
    [EqualTo, EqualNullSafe, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual]
)


def _filters():
    str_cmp = st.builds(
        lambda c, op, v: op((c,), v), st.sampled_from(_STR_COLS), _CMP, _STR_LITS
    )
    num_cmp = st.builds(
        lambda c, op, v: op((c,), v), st.sampled_from(_NUM_COLS), _CMP, _INT_LITS
    )
    date_cmp = st.builds(lambda op, v: op(("ASDATE",), v), _CMP, _DATE_LITS)
    in_str = st.builds(
        lambda c, vs: In((c,), tuple(vs)),
        st.sampled_from(_STR_COLS),
        st.lists(_STR_LITS, min_size=0, max_size=4),
    )
    in_num = st.builds(
        lambda c, vs: In((c,), tuple(vs)),
        st.sampled_from(_NUM_COLS),
        st.lists(_INT_LITS, min_size=0, max_size=4),
    )
    like = st.builds(
        lambda c, k, v: k((c,), v),
        st.sampled_from(_STR_COLS),
        st.sampled_from([StringStartsWith, StringEndsWith, StringContains]),
        st.sampled_from(["TAB", "7", "L1", "FLD_01", "%", "_", "O'x", "3", ""]),
    )
    null_f = st.builds(
        lambda c, k: k((c,)),
        st.sampled_from(COLS),
        st.sampled_from([IsNull, IsNotNull]),
    )
    base = st.one_of(str_cmp, num_cmp, date_cmp, in_str, in_num, like, null_f)
    term = st.one_of(base, base.map(Not))
    or_f = st.builds(
        lambda cs: OrGroup(tuple(cs)), st.lists(term, min_size=2, max_size=3)
    )
    return st.one_of(term, or_f, or_f.map(Not))


@settings(max_examples=150, deadline=None)
@given(st.lists(_filters(), min_size=1, max_size=3))
def test_eval_filter_matches_duckdb_where(filters):
    """For any column-typed filter conjunction, the evaluator's surviving
    row set equals DuckDB's `SELECT rid FROM t WHERE a AND b AND ...` —
    True-only survival on one side, ANSI three-valued logic on the other."""
    mine = [
        i
        for i, r in enumerate(_ROWS)
        if all(_eval_filter(f, r) is True for f in filters)
    ]
    where = " AND ".join(_sql_of(f) for f in filters)
    theirs = [
        rid
        for (rid,) in _CON.execute(
            f"SELECT rid FROM t WHERE {where} ORDER BY rid"
        ).fetchall()
    ]
    assert mine == theirs, where


def test_eval_filter_three_valued_or_truth_cells():
    """The specific OR cells three-valued logic gets wrong first, pinned
    explicitly (not just statistically): NULL OR TRUE = TRUE (row kept via
    the other disjunct), NULL OR FALSE = NULL (dropped), NOT(NULL OR
    FALSE) = NULL (still dropped — De Morgan does not resurrect it)."""
    row = {"TABNAME": "TAB3", "POSITION": None}
    t = EqualTo(("TABNAME",), "TAB3")
    f = EqualTo(("TABNAME",), "nope")
    n = LessThan(("POSITION",), 40)  # NULL position -> NULL
    assert _eval_filter(OrGroup((n, t)), row) is True
    assert _eval_filter(OrGroup((n, f)), row) is None
    assert _eval_filter(Not(OrGroup((n, f))), row) is None
    assert _eval_filter(Not(OrGroup((f, f))), row) is True
