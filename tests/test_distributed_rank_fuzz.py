"""Randomized value-level check of the shared distributed_rank kernel
(pkg/operators/relational.py): the range-partition + broadcast-prefix-offset
composition must reproduce the exact global 1-based row_number under the
caller's total order, for arbitrary data — including negative values (the
numericalize caller ranks on NEGATED frequencies), duplicate values in the
leading order column (ties broken by later columns), frames smaller than the
partition count (some range partitions empty), and non-default ``parts``
values (the count is derived from defaultParallelism in production — floor 8,
cap 2048 — so the kernel must be correct at ANY partition count).

The kernel serves five registry queries (data_skew_report, events_rfm_
segments, agg_equidepth_histogram, ml_score_calibration, text_numericalize);
each is oracle-checked end-to-end, but this fuzz pins the KERNEL so a
refactor cannot break all five in a value-identical-looking way that only a
full sweep would catch."""

from __future__ import annotations

import random

from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.relational import (
    distributed_rank,
)


def _check(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "a BIGINT, b STRING")
    got = {
        (r["a"], r["b"]): r["i"]
        for r in distributed_rank(df, ["a", "b"], out="i", parts=parts).collect()
    }
    want = {
        key: i + 1 for i, key in enumerate(sorted(rows))
    }
    assert got == want, (sorted(got.items())[:5], sorted(want.items())[:5])


def test_distributed_rank_matches_global_enumeration(spark):
    for seed, n in ((7, 500), (42, 64), (99, 1000)):
        rng = random.Random(seed)
        # duplicate-heavy leading column (negative and positive), tie-free
        # only through the (a, b) pair — exactly the caller contract
        rows = list(
            {
                (rng.randrange(-50, 50), f"w{rng.randrange(n)}")
                for _ in range(n)
            }
        )
        _check(spark, rows)


def test_distributed_rank_tiny_frames_and_boundaries(spark):
    # frames at and below the partition count: empty range partitions must
    # still produce dense 1..n ranks
    for rows in (
        [(0, "only")],
        [(1, "a"), (1, "b"), (1, "c")],          # all ties on the lead col
        [(-3, "x"), (-3, "w"), (2, "a"), (2, "b"), (2, "c"), (7, "z")],
    ):
        _check(spark, rows)


def test_distributed_rank_non_default_parts(spark):
    """The partition count is a free parameter (production derives it from
    defaultParallelism): ranks must be identical at 1, a prime, the floor,
    and counts far above the row count (mostly-empty range partitions)."""
    rng = random.Random(1234)
    rows = list(
        {(rng.randrange(-30, 30), f"w{rng.randrange(400)}") for _ in range(400)}
    )
    for parts in (1, 3, 8, 17, 64, 997):
        _check(spark, rows, parts=parts)


def test_rank_parts_derivation(spark):
    """parts = clamp(defaultParallelism, 8, 2048): the floor keeps tiny
    sessions on the multi-partition path; the cap bounds the driver-side
    offset collect."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.relational import (
        _RANK_PARTS_CAP,
        SKEW_RANK_PARTS,
        _rank_parts,
    )

    got = _rank_parts(spark)
    dp = spark.sparkContext.defaultParallelism
    assert got == min(max(SKEW_RANK_PARTS, dp), _RANK_PARTS_CAP)
    assert SKEW_RANK_PARTS <= got <= _RANK_PARTS_CAP
