"""Randomized correctness checks for the two window-form recurrences
(SURVEY §2.9b D22/D30): seeded random per-key streams are run through the
registered window formulations and compared against the literal serial
recurrences computed in plain Python — CUSUM in exact Decimal, EWMA as the
identical float fold.  The fixture-based twins in test_pipeline_ops cover
the real tables; these cover adversarial shapes (ties, all-below-drift
streams, single-row keys, alarm-on-first-row)."""

from __future__ import annotations

import random
from decimal import Decimal

from pyspark.sql import Window
from pyspark.sql import functions as F


def _streams(seed: int, n_keys: int = 25, max_len: int = 60):
    rng = random.Random(seed)
    rows = []
    for k in range(n_keys):
        for t in range(rng.randrange(1, max_len)):
            # two-decimal values spanning calm and bursty regimes, plus
            # exact-boundary magnitudes around the CUSUM drift constant
            v = rng.choice(
                [
                    round(rng.uniform(0, 80), 2),
                    round(rng.uniform(0, 500), 2),
                    60.0,
                    460.0,
                ]
            )
            rows.append((k, t, v))
    return rows


def test_cusum_window_form_matches_serial_on_random_streams(spark):
    k_drift, h = Decimal(60), 400
    for seed in (7, 23, 61):
        rows = _streams(seed)
        df = spark.createDataFrame(rows, "key int, t int, v double")
        order = [F.asc("t")]
        w_all = (
            Window.partitionBy("key")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_prev = (
            Window.partitionBy("key")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        zero = F.lit(0).cast("decimal(12,2)")
        step = F.col("v").cast("decimal(12,2)") - F.lit(60).cast("decimal(12,2)")
        p = df.select("key", "t", F.sum(step).over(w_all).alias("pref"))
        cusum = F.col("pref") - F.least(
            zero, F.coalesce(F.min("pref").over(w_prev), zero)
        )
        got = {
            (r.key, r.t): Decimal(str(r.c))
            for r in p.withColumn("c", cusum.cast("double"))
            .filter(F.col("c") >= h)
            .collect()
        }
        # literal serial recurrence
        expected = {}
        state: dict[int, Decimal] = {}
        for key, t, v in sorted(rows):
            s = state.get(key, Decimal(0))
            s = max(Decimal(0), s + Decimal(str(v)).quantize(Decimal("0.01")) - k_drift)
            state[key] = s
            if s >= h:
                expected[(key, t)] = s
        assert set(got) == set(expected), f"seed {seed}: alarm sets differ"
        for kk in got:
            assert got[kk] == expected[kk], f"seed {seed}: {kk}"
        assert expected, f"seed {seed}: degenerate fuzz (no alarms at all)"


def test_ewma_window_form_matches_serial_fold_on_random_streams(spark):
    alpha, span = 0.25, 16
    for seed in (11, 43):
        rows = _streams(seed)
        df = spark.createDataFrame(rows, "key int, t int, v double")
        w = (
            Window.partitionBy("key")
            .orderBy(F.asc("t"))
            .rowsBetween(-(span - 1), Window.currentRow)
        )
        fold = F.aggregate(
            F.slice(F.col("w"), F.lit(2), F.size("w") - 1),
            F.element_at(F.col("w"), 1),
            lambda s, x: F.lit(alpha) * x + F.lit(1 - alpha) * s,
        )
        got = {
            (r.key, r.t): r.ewma
            for r in df.select(
                "key", "t", F.collect_list("v").over(w).alias("w")
            )
            .select("key", "t", fold.alias("ewma"))
            .collect()
        }
        # serial reference: the same truncated strict left fold in Python
        # floats (bit-identical operation sequence)
        by_key: dict[int, list[tuple[int, float]]] = {}
        for key, t, v in sorted(rows):
            by_key.setdefault(key, []).append((t, v))
        for key, series in by_key.items():
            for i, (t, _) in enumerate(series):
                window = [v for _, v in series[max(0, i - span + 1) : i + 1]]
                s = window[0]
                for x in window[1:]:
                    s = alpha * x + (1 - alpha) * s
                assert got[(key, t)] == s, f"seed {seed}: ({key},{t})"
