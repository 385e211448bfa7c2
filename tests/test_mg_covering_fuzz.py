"""Property test for the Misra-Gries covering bound behind
agg_heavy_hitters (relational._mg_candidate_kernel): under ANY stream
content, ANY partitioning of the stream, ANY batching within a partition,
and ANY counter budget m >= 1, every key with global frequency > n/m must
appear in at least one partition's survivor set, and each partition's
survivor set must respect the budget.  This is the partition-layout
independence the operator's SCALE HONESTY docstring claims — the seeded
8-way case lives in tests/test_llm_ops.py; this fuzzes the law itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.relational import (
    _mg_candidate_kernel,
)

# small alphabet so heavy keys emerge; skewed draws so the n/m bound is
# actually exceeded by some keys in most examples
streams = st.lists(
    st.one_of(st.integers(0, 3), st.integers(0, 50)),  # skew toward 0..3
    min_size=1,
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(
    streams,
    st.integers(1, 6),  # number of partitions
    st.integers(1, 4),  # batches per partition
    st.integers(1, 16),  # the `d` column the kernel derives its budget from
)
def test_mg_covering_bound_any_layout(vals, n_parts, n_batches, d):
    stream = np.array(vals, dtype="int64")
    n = len(stream)
    # the kernel's effective counter budget, derived from `d` exactly as
    # the kernel does (m = ceil(20*d/27)); its guarantee is stated against
    # THIS budget: every key with global freq > n/m survives somewhere
    m = max(1, (20 * d + 26) // 27)

    survivors: set[int] = set()
    for part in np.array_split(stream, n_parts):
        if len(part) == 0:
            continue
        batches = (
            pd.DataFrame({"key": chunk, "d": np.full(len(chunk), d, dtype="int64")})
            for chunk in np.array_split(part, min(n_batches, len(part)))
            if len(chunk)
        )
        out = list(_mg_candidate_kernel(batches))
        assert sum(len(o) for o in out) <= m  # budget held per partition
        survivors.update(int(k) for o in out for k in o["key"])

    freqs = pd.Series(stream).value_counts()
    qualifying = set(freqs[freqs * m > n].index.astype(int))
    assert qualifying <= survivors, (
        f"covering bound violated: {qualifying - survivors} qualify "
        f"(freq > n/m = {n}/{m}) but no partition emitted them"
    )
