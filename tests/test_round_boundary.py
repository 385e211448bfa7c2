"""Regression test for the round(6) half-repr flip found by the round-6
sf0.1 parity sweep: cume_dist over a partition whose size carries a 2^7
factor (640 = 2^7 x 5) produces ratios like 333/640 = 0.5203125 whose
shortest decimal repr ends in ...5 at the 7th place — Spark's round (HALF_UP
on the shortest repr) and DuckDB's round (on the binary value, just below
the half) then disagree.  window_distribution therefore surfaces the RAW
doubles, which are bit-exact across engines; this test pins that contract
on a synthetic partition engineered to sit on the boundary.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.oracle_harness import compare

N = 640  # 2^7 x 5: k/N terminates at exactly 7 decimals for odd k


def test_unrounded_distribution_exact_on_boundary_partition(spark):
    df = spark.range(N).select(
        F.col("id").cast("bigint").alias("k"), F.lit(1).alias("g")
    )
    w = Window.partitionBy("g").orderBy("k")
    got = df.select(
        "k",
        F.cume_dist().over(w).alias("cume"),
        F.percent_rank().over(w).alias("pct"),
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT range AS k, 1 AS g FROM range({N})")
    compare(
        got,
        con,
        """
        SELECT k,
               cume_dist()    OVER (PARTITION BY g ORDER BY k) AS cume,
               percent_rank() OVER (PARTITION BY g ORDER BY k) AS pct
        FROM t
        """,
        "boundary-partition",
    )


def test_the_flip_class_is_real(spark):
    """Documents WHY the unrounded form is required: 0.5203125 (= 333/640)
    rounds differently through Spark than through Python/DuckDB binary
    rounding.  If a future Spark aligns its round with binary-value
    rounding, this starts failing — then the guard can be retired."""
    v = 333 / 640  # shortest repr "0.5203125"; binary value just below it
    spark_rounded = (
        spark.range(1).select(F.round(F.lit(v), 6).alias("r")).first()["r"]
    )
    duck_rounded = duckdb.connect().execute(f"SELECT round({v!r}::DOUBLE, 6)").fetchone()[0]
    assert spark_rounded != duck_rounded  # 0.520313 vs 0.520312
