"""UDF / UDAF / UDTF surface U1-U4 (SURVEY §2.10).

UDFs are the engine's slow path — these exist to prove the surface, and each
docstring says what the fast path is.  U2/U3 are Arrow-batched (pandas);
U1 is a row-at-a-time Python UDF kept off any hot path by design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from ..catalog import load
from ..registry import QuerySpec, spec


@spec(
    """
    SELECT doc_id, reverse(text) AS rev_text FROM documents
    """,
    doc="U1 scalar row-at-a-time Python UDF (the slow path — builtin "
    "F.reverse is the fast path; oracle uses the builtin, proving equivalence).",
)
def udf_scalar_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    @udf("string")
    def py_reverse(s: str) -> str:
        return s[::-1] if s is not None else None

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", py_reverse("text").alias("rev_text"))


@spec(
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6)
             AS l2_norm
    FROM embeddings
    """,
    doc="U2 vectorized pandas UDF (Arrow batches): L2 norm per embedding — "
    "10-100x the throughput of U1 on numeric kernels.",
)
def udf_pandas_l2norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def l2(col: pd.Series) -> pd.Series:
        # whole-batch numpy kernel: stack the fixed-dim embeddings into an
        # (n, d) matrix, one einsum-style reduction — no per-row Python.
        # float64 squares are exact images of the float32 inputs, and numpy's
        # pairwise summation agrees with the oracle's sequential fold to well
        # inside the round(…, 6) comparison grain (asserted row-exactly by
        # the parity gate at both test SFs).
        mat = np.stack(col.to_numpy()).astype(np.float64)
        return pd.Series(np.round(np.sqrt(np.einsum("ij,ij->i", mat, mat)), 6))

    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", l2("embedding").alias("l2_norm"))


@spec(
    """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang
    """,
    doc="U3 grouped-map applyInPandas (UDAF-style): per-language corpus stats "
    "computed in pandas per group; integer sums keep it engine-exact.",
)
def udf_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        total = int(pdf["n_chars"].sum())
        n = len(pdf)
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [n],
                "mean_chars": [float(total) / n],
                "max_chars": [int(pdf["n_chars"].max())],
            }
        )

    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").applyInPandas(
        stats, "lang STRING, n_docs BIGINT, mean_chars DOUBLE, max_chars BIGINT"
    )


@spec(
    """
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    WHERE doc_id < 50
    """,
    doc="U4 UDTF shape (one row -> many): explode over a function-produced "
    "array; bounded to doc_id < 50 to keep the oracle comparison small.",
)
def udtf_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))


@spec(
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents WHERE doc_id < 50),
    i AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS pos FROM t)
    SELECT doc_id, CAST(pos AS INTEGER) AS pos,
           w[pos] || ' ' || w[pos + 1] AS bigram
    FROM i
    """,
    doc="U4 as a REAL Python UDTF (Spark >= 3.5 @udtf class, lateral-joined "
    "in SQL): one document row -> one row per adjacent-token bigram.  The "
    "fast path for this particular expansion is builtin explode "
    "(udtf_explode_words); the UDTF surface exists for expansions builtins "
    "can't express (stateful tokenizers, model-backed extractors).",
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, bigram STRING")
    class Bigrams:
        def eval(self, text: str):
            if text is None:
                return
            w = text.split(" ")
            for i in range(len(w) - 1):
                yield i + 1, w[i] + " " + w[i + 1]

    spark.udtf.register("bigrams", Bigrams)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        "SELECT doc_id, pos, bigram FROM udtf_docs, LATERAL bigrams(text)"
    )


@spec(
    """
    SELECT lang,
           CAST(median(n_chars) AS DOUBLE) AS median_chars,
           round(CAST(quantile_cont(n_chars, 0.75) AS DOUBLE)
                 - CAST(quantile_cont(n_chars, 0.25) AS DOUBLE), 6) AS iqr_chars
    FROM documents GROUP BY lang
    """,
    doc="U2+ GROUPED_AGG pandas UDF — the true vectorized UDAF, completing "
    "the UDF surface (scalar U1, scalar-vectorized U2, grouped-MAP U3, "
    "UDTF U4): whole-group Arrow series in, ONE scalar out, usable "
    "directly inside groupBy().agg() alongside builtins (unlike "
    "applyInPandas, which replaces the whole aggregation).  Kernel = "
    "per-language median and interquartile range via numpy; linear "
    "interpolation on integer inputs at quarter fractions is exact in "
    "float64, so the quantile_cont oracle matches bit-for-bit after "
    "round(6).  Fast path for THESE stats is builtin percentile — the "
    "GROUPED_AGG surface exists for aggregates builtins can't express "
    "(model scoring over a group, sketch merges).",
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def median_chars(v: pd.Series) -> float:
        return float(np.median(v.to_numpy(dtype="float64")))

    @pandas_udf("double")
    def iqr_chars(v: pd.Series) -> float:
        a = v.to_numpy(dtype="float64")
        p25, p75 = np.percentile(a, [25, 75])  # linear interpolation
        return float(np.round(p75 - p25, 6))

    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        median_chars("n_chars").alias("median_chars"),
        iqr_chars("n_chars").alias("iqr_chars"),
    )


QUERIES: dict[str, QuerySpec] = {
    "udf_scalar_reverse": udf_scalar_reverse,
    "udf_pandas_l2norm": udf_pandas_l2norm,
    "udf_grouped_stats": udf_grouped_stats,
    "udf_pandas_grouped_agg": udf_pandas_grouped_agg,
    "udtf_explode_words": udtf_explode_words,
    "udtf_bigrams": udtf_bigrams,
}
