"""TPC-H-shaped headline query suite (beyond the flagship q1/q3/q5 in
``relational.py``), adapted to the fixture schemas in FIXTURES.md.

These exercise the full relational engine at realistic plan complexity —
multi-way joins with broadcastable dims, semi-join subqueries, scalar
subqueries over CTEs, disjunctive pushdown predicates — the query surface a
user of the reference's data lake runs downstream of the SAP extract
(`/root/reference/README.md:21`: the lake exists "for AWS data lake"
consumption; SURVEY §0 consequence 2).

Scale notes (100 TB): every query here shuffles only on its group/join keys;
dimension sides (part/supplier/nation) are broadcast so the fact-table scan
joins map-side; all filters are expressed on scan columns so Catalyst pushes
them into the parquet reader (verified by the plan-shape tests in
tests/test_plans.py for the same patterns).

Fixture-schema adaptations vs. canonical TPC-H (no partsupp table; lineitem
has no commitdate/receiptdate/shipmode; part has no container; customer has
no phone):

* q2  — min-cost supplier per part; lineitem avg sell price stands in for
        the missing ps_supplycost.
* q6  — verbatim shape (filter + single agg).
* q8  — national market share; verbatim shape.
* q9  — product profit; 0.8 * p_retailprice stands in for ps_supplycost.
* q11 — important parts; one nation's shipped revenue stands in for stock
        value (no partsupp).
* q12 — late-shipment priority counts; l_linestatus stands in for the
        missing l_shipmode, shipdate-vs-orderdate lag for receipt/commit.
* q16 — supplier counts per part attrs; negative acctbal stands in for the
        complaints exclusion.
* q20 — promotion candidates; half-of-part's-shipped-volume threshold.
* q21 — waiting suppliers; shipdate lag stands in for receipt/commit lag.
* q7  — volume shipping by (supp_nation, cust_nation, year); verbatim shape.
* q10 — returned-items top-20; drops the missing address/phone/comment cols.
* q14 — promo revenue; ``p_type = 'PROMO'`` (fixture p_type is categorical).
* q15 — top supplier by quarterly revenue via CTE + scalar-subquery max.
* q18 — large-quantity orders (HAVING-IN subquery + 3-way join).
* q19 — disjunctive brand/size/quantity predicates (OR-of-ANDs pushdown).
* q22 — "idle customers": above-average acctbal, no orders since 2000-01-01,
        grouped by nation (nation stands in for the missing phone prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, register_temp_views
from ..functions.exprs import (
    SQL_DISC_PRICE,
    avg_money,
    dec_money,
    dec_rate,
    disc_price,
    sql_sum_money,
    sum_money,
)
from ..registry import QuerySpec, spec

# ---------------------------------------------------------------------------
# q6 — forecast revenue change: filter-only scan + single aggregate.
# ---------------------------------------------------------------------------


@spec(
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H q6 shape: all predicates push to the parquet scan; one "
    "partial+final agg, no shuffle of data rows (A2/P6).",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(sum_money(dec_money("l_extendedprice") * dec_rate("l_discount"), "revenue"))
    )


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations, by shipment year.
# ---------------------------------------------------------------------------


@spec(
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {sql_sum_money(SQL_DISC_PRICE, 'revenue')}
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H q7 shape: fact-fact join (lineitem x orders) with broadcast "
    "nation dims on both legs; the OR pair-filter prunes before the group-by.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    n1 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum_money(disc_price(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q10 — returned-item revenue report (top 20 customers).
# ---------------------------------------------------------------------------


@spec(
    f"""
    SELECT c_custkey, c_name,
           {sql_sum_money(SQL_DISC_PRICE, 'revenue')},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H q10 shape: returned-item revenue top-20; quarter filter on "
    "orders prunes before the lineitem join; nation broadcast.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum_money(disc_price(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q14 — promotion-revenue share.
# ---------------------------------------------------------------------------


@spec(
    f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                 THEN {SQL_DISC_PRICE}
                                 ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
                 / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'
    """,
    doc="TPC-H q14 shape: conditional agg over a broadcast part join "
    "(A7 filtered-agg pattern as a CASE).",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("date"))
    )
    part = F.broadcast(load(spark, sf_dir, "part"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(
        F.lit(0).cast("decimal(22,6)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(disc_price()).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q15 — top supplier(s) by quarterly revenue (CTE + scalar-subquery max).
# ---------------------------------------------------------------------------

_Q15_SQL = f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_sum_money(SQL_DISC_PRICE, 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""


@spec(
    _Q15_SQL,
    doc="TPC-H q15 shape: CTE revenue view + uncorrelated scalar-subquery "
    "max, via the spark.sql entry path (SURVEY §3.4). The revenue values "
    "are decimal-exact doubles on both engines, so the = max() comparison "
    "is deterministic.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(_Q15_SQL)


# ---------------------------------------------------------------------------
# q18 — large-quantity orders.
# ---------------------------------------------------------------------------

_Q18_SQL = """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""


@spec(
    _Q18_SQL,
    doc="TPC-H q18 shape: large-quantity orders, top-100 by order value.  "
    "The oracle states the canonical HAVING-IN form (two lineitem passes); "
    "the Spark plan is the algebraic rewrite — aggregate lineitem ONCE by "
    "l_orderkey, filter the sum, then join orders/customer.  Identical "
    "result (the IN-set and the outer group are the same key), but one "
    "lineitem scan and one shuffle instead of two of each — at 100 TB the "
    "fact table is the cost, so halving its scans dominates.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec_money("l_quantity")).alias("__qty"))
        .filter(F.col("__qty") > 150)
        .select("l_orderkey", F.col("__qty").cast("double").alias("sum_qty"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive predicate revenue (OR-of-ANDs).
# ---------------------------------------------------------------------------


@spec(
    f"""
    SELECT {sql_sum_money(SQL_DISC_PRICE, 'revenue')}
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#18' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H q19 shape: disjunction of conjunctive brand/size/quantity "
    "bands across the join; Catalyst extracts the common l_quantity and "
    "p_brand/p_size sub-predicates to push below the broadcast join.",
)
def q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(load(spark, sf_dir, "part"))
    q = F.col("l_quantity")
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#18") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(sum_money(disc_price(), "revenue"))
    )


# ---------------------------------------------------------------------------
# q22 — idle high-balance customers by nation.
# ---------------------------------------------------------------------------

_Q22_SQL = """
    SELECT n_name,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= DATE '2000-01-01'
          )
    GROUP BY n_name
    ORDER BY n_name
"""


@spec(
    _Q22_SQL,
    doc="TPC-H q22 shape (nation stands in for the missing phone prefix): "
    "uncorrelated scalar-subquery average (decimal-exact, one IEEE division "
    "on both engines) + correlated NOT EXISTS anti-join on orders.",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(_Q22_SQL)


# ---------------------------------------------------------------------------
# q4 — order-priority checking (date-correlated EXISTS on the fact table).
# ---------------------------------------------------------------------------


@spec(
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H q4 shape: correlated EXISTS with a non-equi date condition — "
    "planned as a left-semi join on l_orderkey with the l_shipdate > "
    "o_orderdate predicate evaluated join-side; quarter filter prunes orders "
    "before the semi join.",
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (outer join + double aggregation).
# ---------------------------------------------------------------------------


@spec(
    """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H q13 shape: left-outer customer x orders so zero-order "
    "customers survive (COUNT(col) skips their NULLs), then a second "
    "aggregation over the per-customer counts.  Both shuffles are on "
    "high-cardinality keys with map-side partial aggregation.",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue (correlated scalar avg per part).
# ---------------------------------------------------------------------------


@spec(
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem
                          WHERE l_partkey = p.p_partkey)
    """,
    doc="TPC-H q17 shape.  The oracle states the canonical correlated scalar "
    "subquery (per-part average quantity); the Spark plan is the single-scan "
    "window formulation: broadcast-semi-prune lineitem to the brand's parts, "
    "then AVG(l_quantity) OVER (PARTITION BY l_partkey) — one shuffle on "
    "l_partkey, one fact scan, where the decorrelated aggregate-then-join "
    "form scans and shuffles lineitem twice.  (l_quantity values are "
    "integer-valued doubles, so the average is order-independent and "
    "engine-exact.)",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    brand_parts = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    )
    pruned = li.join(brand_parts, li.l_partkey == brand_parts.p_partkey, "left_semi")
    w = Window.partitionBy("l_partkey")
    return (
        pruned.withColumn("__avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("__avg_qty"))
        .agg(
            (F.sum(dec_money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# q2 — min-cost supplier per part (correlated-min over a dim join).
# Fixture has no partsupp: "cost" is the supplier's realized average sell
# price of the part from lineitem, which preserves q2's plan shape
# (multi-dim join + per-part minimum + tie-keeping filter).
# ---------------------------------------------------------------------------


@spec(
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS supp_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supp_cost,
             MIN(supp_cost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM cost
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE p_size = 15 AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supp_cost
    FROM ranked WHERE supp_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H q2 shape: cheapest supplier per part within a region.  The "
    "per-(part, supplier) cost aggregates once from lineitem (decimal-exact "
    "avg), dims broadcast, and the correlated MIN is a window over "
    "p_partkey — one extra sort within the already-shuffled partition, no "
    "second fact scan.  Ties kept, exactly like canonical q2.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(load(spark, sf_dir, "part").filter(F.col("p_size") == 15))
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    # broadcast-join the filtered part dim BELOW the aggregation (r15):
    # the inner join on l_partkey only FILTERS partkeys (every lineitem of
    # a surviving partkey survives, so the per-(partkey, suppkey) average
    # is over the identical row set — join/groupBy commute here), and
    # p_size = 15 keeps ~2% of parts, so the shuffle into the cost agg
    # carries ~2% of the fact rows instead of all of them (guide §2.3
    # "aggregate less by filtering first"; measured 1.81-1.89 s -> see
    # OPTIMIZATION_r15.md).
    cost = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey", "p_partkey", "p_name")
        .agg(avg_money(dec_money("l_extendedprice"), "supp_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.join(supp, cost.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .withColumn("min_cost", F.min("supp_cost").over(w))
        .filter(F.col("supp_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supp_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q8 — national market share.
# ---------------------------------------------------------------------------


@spec(
    f"""
    SELECT year(o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_6' THEN {SQL_DISC_PRICE}
                         ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
             / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
    GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H q8 shape: NATION_6's share of AMERICA-region PROMO revenue by "
    "order year.  Part/supplier/nation/region broadcast; the only data "
    "shuffles are lineitem x orders and x customer on their keys; the share "
    "is one double division of two decimal-exact sums.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO"))
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    cust = load(spark, sf_dir, "customer")
    n1 = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA"))
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    n2 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
        )
    )
    target = F.when(F.col("supp_nation") == "NATION_6", disc_price()).otherwise(
        F.lit(0).cast("decimal(22,6)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, cust.c_nationkey == n1.n_nationkey)
        .join(region, n1.n_regionkey == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n2, supp.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (F.sum(target).cast("double") / F.sum(disc_price()).cast("double")).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit by nation and year.
# Fixture has no partsupp: supply cost is modeled as 80% of p_retailprice,
# which preserves q9's plan shape (fact x part-name-filter x supplier-nation,
# profit expression inside the aggregate).
# ---------------------------------------------------------------------------

_SQL_Q9_PROFIT = (
    f"{SQL_DISC_PRICE} - CAST(p_retailprice AS DECIMAL(12,2))"
    " * CAST(0.80 AS DECIMAL(5,2)) * CAST(l_quantity AS DECIMAL(12,2))"
)


@spec(
    f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           {sql_sum_money(_SQL_Q9_PROFIT, 'sum_profit')}
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
    doc="TPC-H q9 shape: profit (disc_price - 0.8*retail*qty, decimal-exact) "
    "on gear parts by supplier nation and order year.  The p_name LIKE "
    "filter prunes via the broadcast part join before the orders shuffle.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")))
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    orders = load(spark, sf_dir, "orders")
    profit = disc_price() - dec_money("p_retailprice") * F.lit(0.80).cast(
        "decimal(5,2)"
    ) * dec_money("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("__p"),
        )
        .groupBy("nation", "o_year")
        .agg(sum_money(F.col("__p"), "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# q11 — important parts by stocked value (scalar-subquery HAVING threshold).
# Fixture has no partsupp: value is NATION_5 suppliers' shipped revenue.
# ---------------------------------------------------------------------------

_Q11_SQL = f"""
    WITH v AS (
      SELECT l_partkey, {sql_sum_money(SQL_DISC_PRICE, 'value')}
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_5'
      GROUP BY l_partkey
    )
    SELECT l_partkey, value FROM v
    WHERE value > (SELECT SUM(value) * 0.001 FROM v)
    ORDER BY value DESC, l_partkey
"""


@spec(
    _Q11_SQL,
    doc="TPC-H q11 shape: per-part value for one nation's suppliers, kept "
    "when above an uncorrelated scalar-subquery fraction of the total.  "
    "Spark plans the scalar as a broadcast single-row cross join over the "
    "reused aggregate — the fact table shuffles once.  (Both engines sum "
    "the same decimal-exact doubles; the threshold multiply is one IEEE op.)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(_Q11_SQL)


# ---------------------------------------------------------------------------
# q12 — late shipments by line status and order priority.
# Fixture has no l_shipmode/commitdate/receiptdate: l_linestatus stands in
# for the mode grouping and "late" is shipped >90 days after order date.
# ---------------------------------------------------------------------------


@spec(
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
      AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    doc="TPC-H q12 shape: conditional priority counts over late lines "
    "(shipped >90 days after ordering).  The year filter pushes to the "
    "lineitem scan; the lateness predicate evaluates join-side; CASE sums "
    "combine map-side.",
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            > 90
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# q16 — supplier counts by part attributes (NOT-IN exclusion subquery).
# ---------------------------------------------------------------------------


@spec(
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H q16 shape: distinct-supplier counts per (brand, type, size) "
    "excluding negative-balance suppliers (fixture stand-in for the "
    "complaints filter).  The NOT IN is a broadcast null-aware anti join; "
    "part attribute filters push to the broadcast side's scan.",
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#12")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
    )
    li = load(spark, sf_dir, "lineitem")
    bad = F.broadcast(
        load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# q20 — promotion-candidate suppliers (correlated half-of-total threshold).
# ---------------------------------------------------------------------------


@spec(
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT DISTINCT s_name, n_name
    FROM shipped
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND qty > (SELECT 0.5 * SUM(s2.qty) FROM shipped s2
                 WHERE s2.l_partkey = shipped.l_partkey)
    ORDER BY s_name
    """,
    doc="TPC-H q20 shape: NATION_2 suppliers who shipped more than half of a "
    "small-part's 1997 volume.  The oracle states the canonical correlated "
    "scalar subquery; the Spark plan is the single-pass window formulation "
    "(SUM(qty) OVER (PARTITION BY l_partkey) on the already-grouped frame — "
    "no second aggregate or self-join of the fact table), the same "
    "decorrelation as q17.  Quantities are integer-valued doubles, so the "
    "half-of-total compare is engine-exact.",
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    small = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    )
    shipped = (
        li.join(small, li.l_partkey == small.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec_money("l_quantity")).cast("double").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = F.broadcast(load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2"))
    return (
        shipped.withColumn("__total", F.sum("qty").over(w))
        .filter(F.col("qty") > 0.5 * F.col("__total"))
        .join(supp, shipped.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS self-joins).
# Fixture has no receipt/commit dates: "late" is shipped >60 days after the
# order date; multi-supplier structure is preserved.
# ---------------------------------------------------------------------------

_Q21_SQL = """
    WITH lines AS (
      SELECT l_orderkey, l_suppkey,
             date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
               AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM lines l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1' AND l1.late
      AND EXISTS (SELECT 1 FROM lines l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lines l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


@spec(
    _Q21_SQL,
    doc="TPC-H q21 shape: the sole-late-supplier pattern — a late line on a "
    "finished multi-supplier order where no OTHER supplier was late.  The "
    "oracle states the canonical EXISTS + NOT EXISTS pair (three scans of "
    "the lineitem x orders derivation); the Spark plan collapses both into "
    "ONE per-order aggregate — EXISTS(other supplier) ⟺ "
    "countDistinct(supplier) > 1 and NOT EXISTS(other late supplier) ⟺ "
    "countDistinct(late supplier) = 1 (the probe line is itself late) — so "
    "the fact derivation is aggregated to (order, supplier) grain once, a "
    "window over l_orderkey derives both existence facts, and late-line "
    "counts ride the same rows — ONE fact scan and narrow shuffles, "
    "instead of three semi/anti passes over lineitem.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")) > 60
    )
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.when(late, F.lit(1))).alias("__n_late_lines"))
    )
    w = Window.partitionBy("l_orderkey")
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = F.broadcast(load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1"))
    return (
        per_supp.withColumn("__n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "__n_late_supp",
            F.sum(F.when(F.col("__n_late_lines") > 0, 1).otherwise(0)).over(w),
        )
        .filter(
            (F.col("__n_late_lines") > 0)
            & (F.col("__n_supp") > 1)
            & (F.col("__n_late_supp") == 1)
        )
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("__n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


QUERIES: dict[str, QuerySpec] = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_late_shipments": q12_late_shipments,
    "q16_supplier_counts": q16_supplier_counts,
    "q20_promotion_suppliers": q20_promotion_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q4_priority_check": q4_priority_check,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q10_returned_items": q10_returned_items,
    "q13_order_distribution": q13_order_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_quantity": q17_small_quantity,
    "q15_top_supplier": q15_top_supplier,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_bands": q19_disjunctive_bands,
    "q22_idle_customers": q22_idle_customers,
}
