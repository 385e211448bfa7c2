"""Cross-engine-deterministic expression helpers.

The driver compares Spark results to DuckDB by value hash, so every
floating-point aggregate must be bit-identical across engines.  Policy
(mirrored in the oracle SQL strings):

* money/quantity columns -> ``DECIMAL(12,2)``; rates (discount/tax) ->
  ``DECIMAL(5,2)``.  Decimal arithmetic is exact and engine-independent as
  long as intermediate precision stays <= 38 (it does for the products used
  here: (12,2)*(5,2)*(5,2) -> (22,6)).
* sums happen in decimal, the *final* value is cast to DOUBLE (the decimal
  -> double conversion is deterministic: nearest representable double).
* averages are ``CAST(decimal_sum AS DOUBLE) / COUNT`` — one IEEE division,
  identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- decimal-safe money math -------------------------------------------------

def dec_money(c: str | Column) -> Column:
    """Price/quantity column as exact DECIMAL(12,2)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(12,2)")


def dec_rate(c: str | Column) -> Column:
    """Rate column (discount/tax, 2dp in [0,1]) as exact DECIMAL(5,2)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(5,2)")


def one() -> Column:
    """Literal 1 as DECIMAL(5,2) (lazy: needs an active SparkSession)."""
    return F.lit(1).cast("decimal(5,2)")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return dec_money("l_extendedprice") * (one() - dec_rate("l_discount"))


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal."""
    return disc_price() * (one() + dec_rate("l_tax"))


def sum_money(c: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as a deterministic DOUBLE."""
    return F.sum(c).cast("double").alias(alias)


def avg_money(c: Column, alias: str) -> Column:
    """Decimal-sum / count as one IEEE double division (deterministic)."""
    return (F.sum(c).cast("double") / F.count(F.lit(1))).alias(alias)


# Matching SQL fragments for DuckDB oracles.
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))"
)
SQL_CHARGE = SQL_DISC_PRICE + " * (CAST(1 AS DECIMAL(5,2)) + CAST(l_tax AS DECIMAL(5,2)))"


def sql_sum_money(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def sql_avg_money(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) / COUNT(*) AS {alias}"


# --- portable hashing (same value computable in Spark and DuckDB SQL) --------

HEX = "0123456789abcdef"


def md5_hex_val(c: Column, pos: int) -> Column:
    """Value 0..15 of the ``pos``-th (1-based) hex digit of md5(c).

    Portable across engines: both Spark and DuckDB produce the same
    lowercase-hex md5, and the digit is decoded by position lookup instead of
    engine-specific hex parsing.
    """
    return F.instr(F.lit(HEX), F.substring(F.md5(c), pos, 1)) - F.lit(1)


def sql_md5_hex_val(expr: str, pos: int) -> str:
    return f"(strpos('{HEX}', substring(md5({expr}), {pos}, 1)) - 1)"


def md5_byte(c: Column, byte_idx: int) -> Column:
    """Byte 0..255 from two hex digits of md5(c); ``byte_idx`` is 0-based."""
    p = 2 * byte_idx + 1
    return md5_hex_val(c, p) * F.lit(16) + md5_hex_val(c, p + 1)


def sql_md5_byte(expr: str, byte_idx: int) -> str:
    p = 2 * byte_idx + 1
    return f"({sql_md5_hex_val(expr, p)} * 16 + {sql_md5_hex_val(expr, p + 1)})"


def md5_h32(c: Column) -> Column:
    """First 32 bits of md5(c) as a BIGINT — the portable uniform-hash seed
    for sampling (one digest evaluation + one base conversion)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def sql_md5_h32_from(m: str) -> str:
    """The md5_h32 value from an already-materialized md5 hex string ``m``
    (DuckDB has no conv(); positional digit decode over the single digest)."""
    terms = [
        f"(strpos('{HEX}', substring({m}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def md5_h16(c: Column) -> Column:
    """First 16 bits of md5(c) as an INT — ONE digest evaluation + one base
    conversion (vs 4 digest evaluations for two md5_byte extractions)."""
    return F.conv(F.substring(F.md5(c), 1, 4), 16, 10).cast("int")


def sql_md5_h16_from(m: str) -> str:
    """The md5_h16 value from an already-materialized md5 hex string ``m``
    (DuckDB has no conv(); positional digit decode over the single digest)."""
    terms = [
        f"(strpos('{HEX}', substring({m}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(terms) + ")"
