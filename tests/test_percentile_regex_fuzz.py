"""Property-style fuzz for the round-5 additions the r5 verdict called
young (item 7): percentile_cont interpolation at group boundaries and regex
NULL/empty-match parity.  Pattern follows tests/test_asof_fuzz.py — seeded
random inputs, compared against a plain-Python reference AND the DuckDB
twin expression on identical data."""

from __future__ import annotations

import math
import random

import duckdb
import pyarrow as pa
from pyspark.sql import functions as F

from tests.oracle_harness import compare


# --- percentile_cont at group boundaries -----------------------------------


def _percentile_cont(sorted_vals: list[float], p: float) -> float:
    """SQL-standard linear interpolation: pos = p * (n - 1)."""
    n = len(sorted_vals)
    if n == 1:
        return sorted_vals[0]
    pos = p * (n - 1)
    lo = math.floor(pos)
    frac = pos - lo
    if frac == 0.0:
        return sorted_vals[lo]
    return sorted_vals[lo] + frac * (sorted_vals[lo + 1] - sorted_vals[lo])


def test_percentile_interpolation_matches_reference_and_duckdb(spark):
    """Group sizes 1..5 are ALL boundary cases for the interpolation (n=1:
    no interpolation; n=2: every p interpolates; exact-integer positions
    must not interpolate).  Duplicates and negatives included."""
    rng = random.Random(1234)
    rows = []
    gid = 0
    for size in [1, 1, 2, 2, 3, 3, 4, 5, 7, 19, 64]:
        vals = [round(rng.uniform(-100, 100), 3) for _ in range(size)]
        if size >= 3:  # plant duplicates: ties around the interpolation point
            vals[1] = vals[0]
        rows += [(gid, v) for v in vals]
        gid += 1
    ps = [0.0, 0.25, 0.5, 0.75, 0.9, 1.0]

    sdf = spark.createDataFrame(rows, "g INT, v DOUBLE")
    aggs = [
        F.round(F.percentile(F.col("v"), F.lit(p)), 6).alias(f"p{int(p * 100)}")
        for p in ps
    ]
    got = {r["g"]: r.asDict() for r in sdf.groupBy("g").agg(*aggs).collect()}

    by_g: dict[int, list[float]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        for p in ps:
            want = round(_percentile_cont(vals, p), 6)
            assert abs(got[g][f"p{int(p * 100)}"] - want) <= 1e-9, (g, p, vals)

    # and the DuckDB twin on the identical rows (oracle-parity form)
    con = duckdb.connect()
    con.register("t", pa.table({"g": [g for g, _ in rows], "v": [v for _, v in rows]}))
    cols = ", ".join(
        f"round(quantile_cont(v, {p}), 6) AS p{int(p * 100)}" for p in ps
    )
    compare(
        sdf.groupBy("g").agg(*aggs),
        con,
        f"SELECT g, {cols} FROM t GROUP BY g",
        "percentile_fuzz",
    )


# --- regex NULL / empty-match parity ---------------------------------------


def _fuzz_strings(seed: int, n: int) -> list[str | None]:
    rng = random.Random(seed)
    alphabet = "abcde AEIOU aeiou 0123!-"
    out: list[str | None] = [None, "", " ", "bcd", "AEIOU", "aaaa", "b1!"]
    while len(out) < n:
        out.append("".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 14))))
    return out


def test_regex_null_and_empty_match_parity(spark):
    """The fn_regex expression set over NULLs, empty strings, and
    no-match strings: extract falls back to '', extract-all to an empty
    join, replace/match pass NULL through — identically on both engines."""
    strings = _fuzz_strings(99, 120)
    rows = list(enumerate(strings))
    sdf = spark.createDataFrame(rows, "id BIGINT, s STRING")
    got = sdf.select(
        "id",
        F.regexp_extract("s", "[a-z]+", 0).alias("first_word"),
        F.size(F.regexp_extract_all("s", F.lit("[aeiou]"), F.lit(0))).alias("n_vowels"),
        F.array_join(F.regexp_extract_all("s", F.lit("[a-z]{4,}"), F.lit(0)), "|").alias(
            "long_words"
        ),
        F.regexp_replace("s", "[aeiou]", "*").alias("devoweled"),
        F.col("s").rlike("^[a-z]").alias("starts_lower"),
    )
    con = duckdb.connect()
    con.register("t", pa.table({"id": [i for i, _ in rows], "s": strings}))
    compare(
        got,
        con,
        """
        SELECT id,
               regexp_extract(s, '[a-z]+', 0) AS first_word,
               CASE WHEN s IS NULL THEN NULL
                    ELSE len(regexp_extract_all(s, '[aeiou]')) END AS n_vowels,
               CASE WHEN s IS NULL THEN NULL
                    ELSE COALESCE(array_to_string(regexp_extract_all(s, '[a-z]{4,}'), '|'), '')
               END AS long_words,
               regexp_replace(s, '[aeiou]', '*', 'g') AS devoweled,
               regexp_matches(s, '^[a-z]') AS starts_lower
        FROM t
        """,
        "regex_fuzz",
    )
