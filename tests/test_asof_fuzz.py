"""Randomized correctness check for the as-of join composition (SURVEY §7
ranks its tie-breaking vs DuckDB as a top risk): a seeded random dataset is
joined with asof_join and compared against a brute-force per-row reference
computed in plain Python."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.joins import asof_join


def _make_data(seed: int, n_left: int = 400, n_right: int = 300):
    rng = random.Random(seed)
    left = [
        (i, rng.randrange(20), rng.randrange(1000))  # (id, key, t)
        for i in range(n_left)
    ]
    # deliberately include duplicate (key, t) right rows — payload must come
    # from the latest t; among equal t the composition takes the last-sorted
    # row, so make payload unique per (key, t) to keep the reference exact
    seen = set()
    right = []
    for j in range(n_right):
        k, t = rng.randrange(20), rng.randrange(1000)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        right.append((k, t, j))  # (key, t, payload)
    return left, right


def _brute_force(left, right):
    out = {}
    for lid, k, t in left:
        best = None
        for rk, rt, payload in right:
            if rk == k and rt <= t and (best is None or rt > best[0]):
                best = (rt, payload)
        out[lid] = best[1] if best else None
    return out


def test_asof_join_matches_bruteforce(spark):
    for seed in (7, 42):
        left, right = _make_data(seed)
        ldf = spark.createDataFrame(left, "id BIGINT, k BIGINT, t BIGINT")
        rdf = spark.createDataFrame(right, "k BIGINT, t BIGINT, payload BIGINT")
        got = {
            r["id"]: r["payload"]
            for r in asof_join(
                ldf,
                rdf.select(F.col("k").alias("rk"), F.col("t").alias("rt"), "payload"),
                left_key="k",
                right_key="rk",
                left_time="t",
                right_time="rt",
                payload_cols=["payload"],
            ).collect()
        }
        want = _brute_force(left, right)
        assert got == want, f"seed {seed}: {sum(got[i] != want[i] for i in want)} diffs"
