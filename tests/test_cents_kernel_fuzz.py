"""Property tests for the exact-cents kernel pair in streaming/ops.py:
`_decimal_cents_vec` (numpy fast path + Decimal-resolved ambiguity band)
must agree with `_decimal_cents` (the scalar mirror of Spark's
double -> DECIMAL(12,2) HALF_UP cast) on EVERY finite double — including
magnitudes right at the 1e6 band-validity guard, sub-cent values, and
adversarially constructed near-.5-boundary doubles — and must reject
non-finite inputs loudly (ADVICE r8 item 1).  Seeded-array coverage lives
in tests/test_advice_regressions.py; this fuzzes beyond it.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.ops import (
    _decimal_cents,
    _decimal_cents_vec,
)

finite_values = st.one_of(
    # full-precision doubles across the guard boundary (band path <= 1e6,
    # unconditional Decimal path beyond)
    st.floats(min_value=-5e6, max_value=5e6, allow_nan=False, allow_infinity=False),
    # quantized to 2-4 decimals: the population where half-up ties and
    # just-under-boundary doubles (49.615 -> 49.61499...) live
    st.integers(-10_000_000, 10_000_000).map(lambda n: n / 100.0),
    st.integers(-10_000_000, 10_000_000).map(lambda n: n / 1000.0),
    st.integers(-10_000_000, 10_000_000).map(lambda n: n / 10000.0),
    # exact .5-cent ties
    st.integers(-1_000_000, 1_000_000).map(lambda n: n / 100.0 + 0.005),
    # sub-cent dust
    st.floats(min_value=-0.01, max_value=0.01, allow_nan=False, allow_infinity=False),
)


@settings(max_examples=500, deadline=None)
@given(st.lists(finite_values, min_size=1, max_size=50))
def test_vec_kernel_matches_scalar_on_any_finite_doubles(vals):
    arr = np.array(vals, dtype="float64")
    want = np.array([_decimal_cents(float(x)) for x in vals], dtype="int64")
    got = _decimal_cents_vec(arr)
    assert (want == got).all(), arr[want != got]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(finite_values, min_size=0, max_size=10),
    st.sampled_from([math.nan, math.inf, -math.inf]),
)
def test_vec_kernel_rejects_non_finite(vals, bad):
    arr = np.array([*vals, bad], dtype="float64")
    with pytest.raises(ValueError, match="non-finite"):
        _decimal_cents_vec(arr)
