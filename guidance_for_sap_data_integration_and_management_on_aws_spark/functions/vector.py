"""Vector math over ``ArrayType(DoubleType)`` embeddings — built-in
higher-order functions (zip_with / aggregate), JVM-side, no UDFs.

Both engines compute dot products with a sequential left-to-right fold, and
results are compared after round(_, 6), which absorbs any residual
last-bit accumulation differences.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(a: Column, n_bits: int) -> Column:
    """Sign-LSH bucket id from the first ``n_bits`` dimensions (deterministic
    coarse quantizer: same formulation expressible in the SQL oracle).  A
    production variant uses seeded random hyperplanes; signs of leading
    dimensions keep the oracle exact while exercising the identical plan."""
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(F.element_at(a, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


# --- DuckDB SQL twins --------------------------------------------------------


def sql_dot(a: str, b: str) -> str:
    return f"list_dot_product({a}, {b})"


def sql_cosine(a: str, b: str) -> str:
    return f"list_cosine_similarity({a}, {b})"


def sql_sign_bucket(a: str, n_bits: int) -> str:
    terms = [f"(CASE WHEN {a}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(n_bits)]
    return "(" + " + ".join(terms) + ")"
