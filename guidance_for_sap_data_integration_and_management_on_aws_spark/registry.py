"""Query registry: name -> (Spark builder, DuckDB oracle SQL).

Every operator from SURVEY.md §2 registers one oracle-checked query here (the
driver contract in ``/root/repo/__spark_entry__.py``).  Builders take
``(spark, sf_dir)`` and return a DataFrame; oracles are ANSI SQL strings the
driver runs on DuckDB over the same parquet tables.  ``oracle=None`` marks a
genuinely non-SQL-expressible op (driver records a rows-only check).

Conventions that keep the driver's order-insensitive value-hash honest:

* every computed column is aliased identically in the Spark plan and the SQL;
* floating-point aggregates go through DECIMAL (exact, engine-independent)
  and are cast back to DOUBLE at the end, or are rounded identically on both
  sides — never raw ``SUM(double)`` whose bits depend on execution order;
* timestamps in computed outputs are surfaced as dates, epoch seconds or
  formatted strings, so engine-internal timestamp precision (us vs ns) cannot
  leak into the comparison.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


def spec(oracle: str | None, doc: str = "") -> Callable[[Builder], QuerySpec]:
    """Decorator sugar: ``@spec("SELECT ...")`` wraps a builder function."""

    def wrap(fn: Builder) -> QuerySpec:
        return QuerySpec(builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))

    return wrap
