"""Oracle-checked queries for the reference-parity ingest path (SURVEY §7 M1,
operators P1-P5, S6, A1).

The driver's DuckDB oracle can only see the ten lake tables, so these queries
derive an RFC-shaped WA payload *from* the ``part`` table (backtick-joined
field text with padding, bad numerics, initial dates, and ~1/37 malformed
arity), run it through the real ``parse_rfc_frame`` operator, and let DuckDB
replicate the construction+parse in SQL.  The synthetic DD03L fixture path
(MockRfcTransport -> read_rfc_table -> dual sinks) is exercised in
``tests/test_ingest.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import QuerySpec, spec
from ..sources.rfc import RfcField, parse_rfc_frame

FIELDS = [
    RfcField("part_key", "N"),
    RfcField("name", "C"),
    RfcField("brand", "C"),
    RfcField("size_n", "N"),
    RfcField("price", "P", decimal_scale=2),
    RfcField("asdate", "D"),
    RfcField("flag", "C"),
]

# WA construction, DuckDB side (kept textually parallel to _wa_frame below).
SQL_WA = """
    SELECT concat_ws(chr(96),
        CAST(p_partkey AS VARCHAR),
        ' ' || p_name || ' ',
        p_brand,
        CASE WHEN p_partkey % 13 = 0 THEN '#' || CAST(p_size AS VARCHAR)
             ELSE lpad(CAST(p_size AS VARCHAR), 4, '0') END,
        CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR),
        CASE WHEN p_partkey % 11 = 0 THEN '00000000'
             ELSE CAST(1995 + p_partkey % 20 AS VARCHAR)
                  || lpad(CAST(1 + p_partkey % 12 AS VARCHAR), 2, '0')
                  || lpad(CAST(1 + p_partkey % 28 AS VARCHAR), 2, '0') END,
        CASE WHEN p_partkey % 37 = 0 THEN 'X' || chr(96) || 'JUNK' ELSE 'X' END
    ) AS wa FROM part
"""


def _wa_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-derived RFC payload: one backtick-joined WA string per row."""
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")

    def s(c: Column) -> Column:
        return c.cast("string")

    asdate = F.when(k % 11 == 0, F.lit("00000000")).otherwise(
        F.concat(
            s(F.lit(1995) + k % 20),
            F.lpad(s(F.lit(1) + k % 12), 2, "0"),
            F.lpad(s(F.lit(1) + k % 28), 2, "0"),
        )
    )
    wa = F.concat_ws(
        "`",
        s(k),
        F.concat(F.lit(" "), F.col("p_name"), F.lit(" ")),
        F.col("p_brand"),
        F.when(k % 13 == 0, F.concat(F.lit("#"), s(F.col("p_size")))).otherwise(
            F.lpad(s(F.col("p_size")), 4, "0")
        ),
        s(F.col("p_retailprice").cast("decimal(12,2)")),
        asdate,
        F.when(k % 37 == 0, F.lit("X`JUNK")).otherwise(F.lit("X")),
    )
    return p.select(wa.alias("wa"))


@spec(
    f"""
    WITH src AS ({SQL_WA}),
    split_rows AS (SELECT wa, string_split(trim(wa), chr(96)) AS s FROM src)
    SELECT TRY_CAST(trim(s[1]) AS BIGINT) AS part_key,
           trim(s[2]) AS name,
           trim(s[3]) AS brand,
           TRY_CAST(trim(s[4]) AS BIGINT) AS size_n,
           TRY_CAST(trim(s[5]) AS DECIMAL(38,2)) AS price,
           CAST(try_strptime(NULLIF(trim(s[6]), '00000000'), '%Y%m%d') AS DATE) AS asdate,
           trim(s[7]) AS flag
    FROM split_rows WHERE len(s) = 7
    """,
    doc="P1 parse + P2 arity filter + P3 naming + P4 trim + P5 DDIC casts "
    "(N->bigint best-effort, P->decimal, D->date with initial '00000000' -> NULL), "
    "exactly the reference pipeline pyrfc_read_table.py:141-174 as one select.",
)
def rfc_parse_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_rfc_frame(_wa_frame(spark, sf_dir), FIELDS).valid


@spec(
    f"""
    WITH src AS ({SQL_WA})
    SELECT wa, CAST(len(string_split(trim(wa), chr(96))) AS INTEGER) AS arity
    FROM src WHERE len(string_split(trim(wa), chr(96))) <> 7
    """,
    doc="S6 dead-letter channel: malformed rows (arity <> field count) with the "
    "original line preserved, as the reference does (pyrfc_read_table.py:146-149).",
)
def rfc_parse_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_rfc_frame(_wa_frame(spark, sf_dir), FIELDS).errors


@spec(
    f"""
    WITH src AS ({SQL_WA}),
    a AS (SELECT len(string_split(trim(wa), chr(96))) = 7 AS ok FROM src)
    SELECT COUNT(*) FILTER (WHERE ok) AS valid_count,
           COUNT(*) FILTER (WHERE NOT ok) AS err_count,
           COUNT(*) AS total_count
    FROM a
    """,
    doc="A1 ingest count invariant: valid + err = total "
    "(reference counters pyrfc_read_table.py:119-153).",
)
def rfc_ingest_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = parse_rfc_frame(_wa_frame(spark, sf_dir), FIELDS)
    v = parsed.valid.agg(F.count(F.lit(1)).alias("valid_count"))
    e = parsed.errors.agg(F.count(F.lit(1)).alias("err_count"))
    return v.crossJoin(e).select(
        "valid_count",
        "err_count",
        (F.col("valid_count") + F.col("err_count")).alias("total_count"),
    )


@spec(
    """
    SELECT TRY_CAST(nullif(v, 'n/a') AS BIGINT) AS as_long,
           TRY_CAST(v AS DOUBLE) AS as_double
    FROM (SELECT CASE WHEN p_partkey % 9 = 0 THEN 'n/a'
                      ELSE CAST(p_partkey AS VARCHAR) END AS v FROM part)
    """,
    doc="P5 best-effort cast in isolation: try_cast leaves NULL on failure "
    "instead of failing the job (reference errors='ignore', pyrfc_read_table.py:172-174).",
)
def try_cast_best_effort(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    v = F.when(F.col("p_partkey") % 9 == 0, F.lit("n/a")).otherwise(
        F.col("p_partkey").cast("string")
    )
    return p.select(v.alias("v")).select(
        F.nullif(F.col("v"), F.lit("n/a")).try_cast("bigint").alias("as_long"),
        (F.col("v")).try_cast("double").alias("as_double"),
    )


QUERIES: dict[str, QuerySpec] = {
    "rfc_parse_valid": rfc_parse_valid,
    "rfc_parse_errors": rfc_parse_errors,
    "rfc_ingest_invariant": rfc_ingest_invariant,
    "try_cast_best_effort": try_cast_best_effort,
}
