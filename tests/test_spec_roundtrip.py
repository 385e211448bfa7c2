"""Property pin of the spec-rendering seam (round-13, VERDICT r12 item 5).

Round 12 gave the stream path a `pushdown` clause-spec option; the only
direct coverage of the text<->Filter seam was transitive (stream==batch
fuzz).  This suite pins it head-on: for any filter list the spec grammar
can express, ``render_pushdown_spec`` -> ``parse_pushdown_spec`` is the
identity BOTH structurally (the parsed Filter dataclasses equal the
originals — typed literals survive the text round trip) and semantically
(the typed re-verification selects the same row set over the mock
fixture's parsed rows, corrupt all-NULL rows included).  Pure Python —
no Spark session needed; the typed rows come from the same ``_py_cast``
parse the reader uses.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
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
    parse_pushdown_spec,
    render_pushdown_spec,
)

FIELDS = list(MockRfcTransport.FIELDS)
COLS = [f.name for f in FIELDS]
_STR_COLS = [f.name for f in FIELDS if f.type_code == "C"]
_NUM_COLS = [f.name for f in FIELDS if f.type_code == "N"]

# literal spaces per column type — the spec grammar's typed-literal domain
# (';' is the documented grammar limit, tested loud below, not generated).
# ' OR ' INSIDE a literal is deliberate: the round-14 term split must be
# quote-aware, including the grammar-injection shape "x' OR TABNAME EQ 'y"
# whose escaped render contains a quoted OR the scanner must not split on.
_STR_LITS = st.sampled_from(
    [
        "TAB3", "ROLL5", "X", "", "FLD_00100", "CHAR", "O'x", "''", "%", "_",
        "a b", "A OR B", "x' OR TABNAME EQ 'y",
    ]
)
_INT_LITS = st.integers(min_value=-5, max_value=99999)
_DATE_LITS = st.dates(
    min_value=datetime.date(1990, 1, 1), max_value=datetime.date(2025, 12, 31)
)

_CMP = st.sampled_from(
    [EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual]
)


def _expressible_filters():
    """Filters the spec grammar can express, with literals typed to their
    column (the grammar's contract: literals must parse as the column's
    DDIC type)."""
    str_cmp = st.builds(
        lambda c, op, v: op((c,), v), st.sampled_from(_STR_COLS), _CMP, _STR_LITS
    )
    num_cmp = st.builds(
        lambda c, op, v: op((c,), v), st.sampled_from(_NUM_COLS), _CMP, _INT_LITS
    )
    date_cmp = st.builds(lambda op, v: op(("ASDATE",), v), _CMP, _DATE_LITS)
    ne = st.builds(
        lambda c, v: Not(EqualTo((c,), v)), st.sampled_from(_STR_COLS), _STR_LITS
    )
    ne_num = st.builds(
        lambda c, v: Not(EqualTo((c,), v)), st.sampled_from(_NUM_COLS), _INT_LITS
    )
    in_str = st.builds(
        lambda c, vs: In((c,), tuple(vs)),
        st.sampled_from(_STR_COLS),
        st.lists(_STR_LITS, min_size=1, max_size=4),
    )
    in_num = st.builds(
        lambda c, vs: In((c,), tuple(vs)),
        st.sampled_from(_NUM_COLS),
        st.lists(_INT_LITS, min_size=1, max_size=4),
    )
    in_date = st.builds(
        lambda vs: In(("ASDATE",), tuple(vs)),
        st.lists(_DATE_LITS, min_size=1, max_size=3),
    )
    like = st.builds(
        lambda c, k, v: k((c,), v),
        st.sampled_from(_STR_COLS),
        st.sampled_from([StringStartsWith, StringEndsWith, StringContains]),
        _STR_LITS,
    )
    simple = st.one_of(
        str_cmp, num_cmp, date_cmp, ne, ne_num, in_str, in_num, in_date, like
    )
    # round-14: 'A OR B' within a clause — a flat disjunction of simple terms
    or_group = st.builds(
        lambda cs: OrGroup(tuple(cs)), st.lists(simple, min_size=2, max_size=3)
    )
    return st.one_of(simple, or_group)


def _typed_rows(n: int = 500) -> list[dict]:
    """The mock fixture parsed the way the reader parses it: corrupt
    (arity-mismatched) lines become all-NULL dicts; valid lines go through
    the per-field _py_cast."""
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


def _select(filters, rows):
    return [
        i
        for i, r in enumerate(rows)
        if all(_eval_filter(f, r) is True for f in filters)
    ]


@settings(max_examples=120, deadline=None)
@given(st.lists(_expressible_filters(), min_size=1, max_size=4))
def test_render_parse_roundtrip_identity(filters):
    """parse(render(filters)) == filters, structurally AND by selected
    row set (the law VERDICT r12 item 5 asks for)."""
    spec = render_pushdown_spec(filters)
    parsed = parse_pushdown_spec(spec, FIELDS)
    assert parsed == list(filters)  # typed literals survive the text trip
    assert _select(parsed, _ROWS) == _select(filters, _ROWS)


@settings(max_examples=60, deadline=None)
@given(st.lists(_expressible_filters(), min_size=1, max_size=3))
def test_roundtrip_is_idempotent_through_the_wire_renderer(filters):
    """One more lap: rendering the PARSED filters back to spec text yields
    the identical spec (the renderer is a right inverse, not merely
    row-set-preserving), so a stream restart that re-parses its stored
    option string can never drift."""
    spec = render_pushdown_spec(filters)
    again = render_pushdown_spec(parse_pushdown_spec(spec, FIELDS))
    assert again == spec


def test_render_rejects_inexpressible_shapes():
    """Shapes outside the grammar fail loud in render (the parse side's
    fail-loud twin): Not over non-EqualTo, null checks, and literals
    containing the ';' clause separator."""
    from pyspark.sql.datasource import IsNull

    with pytest.raises(ValueError, match="cannot express"):
        render_pushdown_spec([Not(GreaterThan(("POSITION",), 3))])
    with pytest.raises(ValueError, match="cannot express"):
        render_pushdown_spec([IsNull(("TABNAME",))])
    with pytest.raises(ValueError, match="cannot contain ';'"):
        render_pushdown_spec([EqualTo(("TABNAME",), "a;b")])


def test_or_group_construction_guards():
    """OrGroup's shape invariants fail loud: fewer than two children (a
    one-child group would render as a bare term and parse back as the
    child, breaking the render∘parse identity) and nested disjunctions
    (the grammar is a FLAT disjunction of simple terms inside one
    conjunctive clause)."""
    a = EqualTo(("TABNAME",), "TAB3")
    b = LessThan(("POSITION",), 40)
    with pytest.raises(ValueError, match="at least two"):
        OrGroup((a,))
    with pytest.raises(ValueError, match="OR-free"):
        OrGroup((a, OrGroup((a, b))))
    with pytest.raises(ValueError, match="OR-free"):
        OrGroup((a, Not(OrGroup((a, b)))))


def test_render_with_fields_validates_literal_types():
    """Round-14 (r13 advice): with the fields list, render is no longer a
    faithful inverse ONLY for column-typed literals — a mistyped literal
    (int against a char column, string against a NUMC column, a bool,
    a datetime where the column is DATS) raises like every other
    'cannot express' path instead of silently changing the filter's
    typed row set through the text trip."""
    import datetime as dt

    with pytest.raises(ValueError, match="parses back as"):
        render_pushdown_spec([EqualTo(("TABNAME",), 5)], FIELDS)
    with pytest.raises(ValueError, match="cannot express"):
        render_pushdown_spec([EqualTo(("POSITION",), "40")], FIELDS)
    with pytest.raises(ValueError, match="cannot express"):
        render_pushdown_spec([EqualTo(("POSITION",), True)], FIELDS)
    with pytest.raises(ValueError, match="parses back as"):
        render_pushdown_spec(
            [EqualTo(("ASDATE",), dt.datetime(2020, 1, 1, 12, 0))], FIELDS
        )
    with pytest.raises(ValueError, match="unknown column"):
        render_pushdown_spec([EqualTo(("NOPE",), "x")], FIELDS)
    with pytest.raises(ValueError, match="cannot express"):
        render_pushdown_spec([In(("POSITION",), (1, "2"))], FIELDS)
    with pytest.raises(ValueError, match="string-typed"):
        render_pushdown_spec([StringStartsWith(("POSITION",), "4")], FIELDS)
    # the validation also applies INSIDE a disjunction
    with pytest.raises(ValueError, match="parses back as"):
        render_pushdown_spec(
            [OrGroup((EqualTo(("TABNAME",), "TAB3"), EqualTo(("TABNAME",), 5)))],
            FIELDS,
        )


@settings(max_examples=80, deadline=None)
@given(st.lists(_expressible_filters(), min_size=1, max_size=3))
def test_render_with_fields_accepts_all_column_typed_literals(filters):
    """The validation must be exactly as permissive as the parse side:
    every filter the generator types to its column renders WITH fields to
    the same spec text as without, and still round-trips."""
    spec = render_pushdown_spec(filters, FIELDS)
    assert spec == render_pushdown_spec(filters)
    assert parse_pushdown_spec(spec, FIELDS) == list(filters)


@settings(max_examples=100, deadline=None)
@given(st.lists(_expressible_filters(), min_size=2, max_size=4))
def test_mock_or_splitter_inverts_client_group_rendering(terms):
    """The two OR splitters are deliberately INDEPENDENT implementations
    (client: character-scan quote tracking; mock server: even-quote-count
    regex lookahead) so a bug in either surfaces in the pushed==unpushed
    fuzz instead of cancelling out — this pins them against each other
    directly: for any renderable disjunction, the mock's split of the
    client's rendered group body recovers exactly the rendered terms."""
    from hypothesis import assume

    from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import (
        _render_clause,
        _spark_type,
    )
    from pyspark.sql.types import StringType

    assume(all(not isinstance(t, OrGroup) for t in terms))  # flat children only
    by_name = {f.name: f for f in FIELDS}
    string_fields = frozenset(
        f.name for f in FIELDS if isinstance(_spark_type(f), StringType)
    )
    parts = [_render_clause(t, by_name, string_fields) for t in terms]
    assume(all(p is not None for p in parts))  # only renderable terms group
    line = _render_clause(OrGroup(tuple(terms)), by_name, string_fields)
    assert line == "( " + " OR ".join(parts) + " )"
    m = MockRfcTransport._OPT_GROUP_RE.match(line)
    assert m is not None
    assert MockRfcTransport._OPT_OR_SPLIT_RE.split(m.group(1)) == parts


def test_render_rejects_universally_inexpressible_literals():
    """None and bool literals fail loud even WITHOUT the fields list: no
    column type parses them back (the grammar has no NULL token and no
    bool domain), so rendering would silently re-type them as the strings
    'None'/'True' — provable without knowing the column, unlike the
    fields-gated per-type validation."""
    for bad in (None, True, False):
        with pytest.raises(ValueError, match="cannot express"):
            render_pushdown_spec([EqualTo(("TABNAME",), bad)])
        with pytest.raises(ValueError, match="cannot express"):
            render_pushdown_spec([In(("TABNAME",), ("TAB3", bad))])


def test_render_rejects_empty_in_and_misdiagnosis_free_messages():
    """Round-14 review: an empty In used to render the unparseable text
    'NAME IN ()' — crashing the consumer at parse time instead of failing
    loud at render time like every other inexpressible shape.  And the
    string-predicate validation names the operand that actually failed
    (column type vs literal type), not a fixed misdiagnosis."""
    with pytest.raises(ValueError, match="empty IN"):
        render_pushdown_spec([In(("TABNAME",), ())])
    with pytest.raises(ValueError, match="empty IN"):
        render_pushdown_spec([In(("TABNAME",), ())], FIELDS)
    with pytest.raises(ValueError, match="string-typed column"):
        render_pushdown_spec([StringStartsWith(("POSITION",), "4")], FIELDS)
    with pytest.raises(ValueError, match="string literal, got int"):
        render_pushdown_spec([StringContains(("TABNAME",), 5)], FIELDS)
